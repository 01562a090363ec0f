"""Op-level time breakdown of ONE guided step on the real chip.

Captures a jax.profiler trace of the production two-program step (built
exactly as bench.py dispatches it), parses the xplane with
jax.profiler.ProfileData, and prints the top ops by total device time.
This is how the round-3 padded-layout monsters were confirmed and how
the next optimization target is picked (PERF.md).

Usage: python tools/profile_step.py [size] [frames] [top_n]
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

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
    sys.exit("chip lock busy for 1h; aborting profile run")

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 512
FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
TOP_N = int(sys.argv[3]) if len(sys.argv) > 3 else 40
# variant: 'bicubic' (default) | 'face' (x8 step inside the face window —
# the demo-equivalent headline config) | 'blur' (gaussian-task step,
# VERDICT r3 #5 forensics) | 'batch2' (independent-window batching)
VARIANT = sys.argv[4] if len(sys.argv) > 4 else "bicubic"


def main() -> int:
    from bench import _bicubic_step, _blur_step

    if VARIANT == "blur":
        fn, args, _ = _blur_step(SIZE, FRAMES)
    else:
        make_step, _ = _bicubic_step(
            SIZE, FRAMES, use_face=VARIANT == "face",
            batch=2 if VARIANT == "batch2" else 1)
        fn, args = make_step("ddim")
    t0 = time.time()
    float(fn(*args))
    print(f"# compile+warmup: {time.time() - t0:.1f}s", flush=True)

    logdir = tempfile.mkdtemp(prefix="flair_step_trace_")
    jax.profiler.start_trace(logdir)
    t0 = time.time()
    float(fn(*args))
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"# traced step wall: {wall * 1e3:.0f} ms", flush=True)

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        print("no xplane.pb produced", file=sys.stderr)
        return 1
    data = jax.profiler.ProfileData.from_file(paths[0])
    by_op: dict[str, float] = defaultdict(float)
    total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            # XLA Ops lines carry per-op events; steps/kernel-launch lines
            # would double-count
            if "XLA Op" not in line.name and "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns / 1e6
                by_op[ev.name] += dur
                total += dur
    if not by_op:
        # fall back: dump line names so the schema can be adapted
        for plane in data.planes:
            print(f"plane: {plane.name}",
                  [ln.name for ln in plane.lines][:8], flush=True)
        return 1
    print(f"# total device op time: {total:.0f} ms "
          f"(async-overlapped; wall {wall * 1e3:.0f})", flush=True)
    for name, ms in sorted(by_op.items(), key=lambda kv: -kv[1])[:TOP_N]:
        print(f"{ms:9.1f} ms  {100 * ms / max(total, 1e-9):5.1f}%  "
              f"{name[:110]}", flush=True)

    # leaf-category aggregation: while/cond/copy-start events are WRAPPERS
    # or async envelopes whose duration double-counts their contents —
    # exclude them, bucket the rest by HLO op kind (the r3 PERF trace
    # methodology); this is the view that names the next target
    cats: dict[str, float] = defaultdict(float)
    leaf_total = 0.0
    for name, ms in by_op.items():
        n = name.lstrip("%")
        if n.startswith(("while", "cond", "copy-start", "copy-done")):
            continue
        kind = n.split(" = ", 1)[0].rstrip("0123456789.").rstrip("-_.")
        if "deform_conv2d_tile" in n:
            kind = "dcn-custom-call"
        elif kind.startswith("fusion"):
            kind = "fusion"
        elif "gather" in kind:
            kind = "gather"
        elif kind.startswith(("convolution", "conv")):
            kind = "convolution"
        elif kind.startswith(("copy", "bitcast", "transpose", "reshape",
                              "slice", "dynamic")):
            kind = "copy/relayout"
        cats[kind] += ms
        leaf_total += ms
    print(f"# leaf categories ({leaf_total:.0f} ms, wrappers excluded):",
          flush=True)
    for kind, ms in sorted(cats.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{ms:9.1f} ms  {100 * ms / max(leaf_total, 1e-9):5.1f}%  "
              f"{kind}", flush=True)

    # the copy/relayout bucket is the round-4 target — name its members
    print("# top copy/relayout ops:", flush=True)
    copies = []
    for name, ms in by_op.items():
        n = name.lstrip("%")
        if n.startswith(("while", "cond", "copy-start", "copy-done")):
            continue
        kind = n.split(" = ", 1)[0].rstrip("0123456789.").rstrip("-_.")
        if kind.startswith(("copy", "bitcast", "transpose", "reshape",
                            "slice", "dynamic")):
            copies.append((ms, name))
    for ms, name in sorted(copies, reverse=True)[:25]:
        print(f"{ms:9.1f} ms  {name[:150]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
