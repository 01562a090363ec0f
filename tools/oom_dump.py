"""Capture the batch-2 (or N) HBM OOM allocation breakdown.

VERDICT r3 #1: independent-window batching is the highest-leverage
throughput lever and batch-2 still OOMs (18.31 G vs 15.75 G). The fix
campaign needs the REAL top allocations, not guesses — this builds the
batch-N bicubic serving step exactly as bench.py does, runs it, and prints
the full RESOURCE_EXHAUSTED message (XLA's buffer table names the hogs).

Usage: python tools/oom_dump.py [batch] [size] [frames]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flair_tpu.utils.locking import acquire_tpu_lock, tpu_lock_needed

if tpu_lock_needed() and acquire_tpu_lock(timeout_s=3600.0) is None:
    sys.exit("chip lock busy for 1h; aborting")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 512
FRAMES = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main() -> int:
    from bench import _bicubic_step

    make_step, _ = _bicubic_step(SIZE, FRAMES, use_face=False, batch=BATCH)
    fn, args = make_step("ddim")
    t0 = time.time()
    try:
        v = float(fn(*args))
        print(f"# batch-{BATCH} RAN OK: {time.time()-t0:.1f}s "
              f"(compile+exec), value {v}", flush=True)
        ts = []
        for _ in range(3):
            t1 = time.time()
            float(fn(*args))
            ts.append(time.time() - t1)
        print(f"# batch-{BATCH} per_step: {min(ts)*1e3:.0f} ms", flush=True)
        return 0
    except Exception as e:  # noqa: BLE001
        print(f"# batch-{BATCH} FAILED after {time.time()-t0:.1f}s: "
              f"{type(e).__name__}", flush=True)
        # the full message carries XLA's allocation table
        print(str(e), flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
