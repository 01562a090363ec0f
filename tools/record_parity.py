"""Run the slow (converter-parity / e2e agreement) suite and record the
result as PARITY_r<N>.json at the repo root (VERDICT r1 item 10: the
crown-jewel tests are deselected from the default run; this artifact
proves they passed for a given commit).

Usage: python tools/record_parity.py [round_number]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "02"
    rev = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
        capture_output=True, text=True).stdout.strip()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-m", "slow", "-q",
         "--override-ini", "addopts=", "-rN", "--tb=line"],
        cwd=ROOT, capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()
    summary = tail[-1] if tail else ""
    m = re.findall(r"(\d+) (passed|failed|skipped|error)", summary)
    counts = {k: int(v) for v, k in m}
    failures = [
        ln for ln in tail if ln.startswith("FAILED") or ln.startswith("ERROR")
    ]
    out = {
        "round": rnd,
        "git": rev,
        "summary": summary,
        "counts": counts,
        "failures": failures,
        "ok": proc.returncode == 0,
    }
    path = os.path.join(ROOT, f"PARITY_r{rnd}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
