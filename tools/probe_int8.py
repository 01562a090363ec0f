"""Probe: int8 MXU dots in Mosaic/Pallas on this toolchain (v5e int8 peak
is ~2x bf16). Keep-or-kill evidence for the round-5 dense-window-dot spike
(VERDICT r4 #4): the tile-DCN kernel's dot1 is MXU-bound at its bf16 MAC
floor (PERF.md), so the only remaining >1.5x per-call lever is executing
the same dots at the int8 rate. This measures, at the kernel's exact dot1
shape (lhs (UVP, BC) contracting dim 0 against (UVP, 128)):

  1. bf16 x bf16 -> f32   (the shipped kernel's dot)
  2. int8 x int8 -> int32 (the candidate)
  3. in-kernel f32 -> int8 quantize cost (round + cast) for the window
     weights, which would have to happen per chunk

Usage: python tools/probe_int8.py [uvp] (default 256 = M5; 384 = M10)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from flair_tpu.utils.locking import acquire_tpu_lock, tpu_lock_needed

if tpu_lock_needed() and acquire_tpu_lock(timeout_s=7200.0) is None:
    sys.exit("chip lock busy for 2h; aborting probe")

UVP = int(sys.argv[1]) if len(sys.argv) > 1 else 256
BC = 576          # rows per (tile, anchor) chunk at (2,4) tiles
LANES = 128
REPS = 32         # distinct dots per grid step (distinct rhs — defeats CSE)
GRID = 1024       # total dots = REPS * GRID


def _timeit(name, fn, *args, reps=3):
    f = jax.jit(lambda *a: fn(*a).astype(jnp.float32).sum())
    t0 = time.time()
    float(f(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(f(*args))
        ts.append(time.time() - t0)
    ms = min(ts) * 1e3 - OVERHEAD_MS
    macs = REPS * GRID * UVP * BC * LANES
    print(f"{name:42s} {ms:9.2f} ms  {macs * 2 / ms / 1e9:8.1f} GFLOP/s "
          f"(compile {compile_s:.1f}s)", flush=True)
    return ms


_triv = jax.jit(lambda x: x.sum())
_z = jnp.zeros((8, 128), jnp.float32)
float(_triv(_z))
_ts = []
for _ in range(5):
    _t0 = time.time()
    float(_triv(_z))
    _ts.append(time.time() - _t0)
OVERHEAD_MS = min(_ts) * 1e3
print(f"# readback overhead: {OVERHEAD_MS:.1f} ms  (uvp={UVP}, "
      f"dots={REPS * GRID}, {REPS * GRID * UVP * BC * LANES * 2 / 1e12:.2f} "
      "TFLOP equiv)", flush=True)


def dot_kernel(a_ref, b_ref, o_ref, *, acc_dt, quantize=False):
    # a_ref varies per grid step (distinct HBM block) so the compiler
    # cannot hoist the dots out of the grid loop (the first probe version
    # used grid-invariant inputs and measured above-peak rates — loop-
    # invariant code motion had collapsed the work)
    acc = None
    for r in range(REPS):
        a = a_ref[0]
        if quantize:
            # the in-kernel cost the real kernel would pay: quantize the
            # f32 window weights (in [0,1]) to int8 per chunk
            a = jnp.round(a * 127.0).astype(jnp.int8)
        d = lax.dot_general(
            a, b_ref[r], (((0,), (0,)), ((), ())),
            preferred_element_type=acc_dt)
        acc = d if acc is None else acc + d
    o_ref[0] = acc


def run(name, a_dt, b_dt, acc_dt, quantize=False):
    if quantize or a_dt == jnp.float32:
        a = jax.random.uniform(jax.random.PRNGKey(0), (GRID, UVP, BC))
    elif a_dt == jnp.int8:
        a = jax.random.randint(
            jax.random.PRNGKey(0), (GRID, UVP, BC), -127, 127, jnp.int8)
    else:
        a = jax.random.normal(
            jax.random.PRNGKey(0), (GRID, UVP, BC)).astype(a_dt)
    if b_dt == jnp.int8:
        b = jax.random.randint(
            jax.random.PRNGKey(1), (REPS, UVP, LANES), -127, 127, jnp.int8)
    else:
        b = jax.random.normal(
            jax.random.PRNGKey(1), (REPS, UVP, LANES)).astype(b_dt)

    kern = functools.partial(dot_kernel, acc_dt=acc_dt, quantize=quantize)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((GRID, BC, LANES), acc_dt),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(GRID,),
            in_specs=[
                pl.BlockSpec((1, UVP, BC), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((REPS, UVP, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BC, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )
    try:
        _timeit(name, lambda a, b: out(a, b), a, b)
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)


def check_numerics():
    """int8 dot vs f32 reference in interpret mode (correctness of the
    Mosaic lowering path we would ship)."""
    a = jax.random.randint(
        jax.random.PRNGKey(2), (1, UVP, BC), -127, 127, jnp.int8)
    b = jax.random.randint(
        jax.random.PRNGKey(3), (REPS, UVP, LANES), -127, 127, jnp.int8)

    kern = functools.partial(dot_kernel, acc_dt=jnp.int32)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, BC, LANES), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[
                pl.BlockSpec((1, UVP, BC), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((REPS, UVP, LANES), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, BC, LANES), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(a, b)
    ref = sum(
        jnp.einsum("ub,ul->bl", a[0].astype(jnp.int32),
                   b[r].astype(jnp.int32)) for r in range(REPS))
    err = int(jnp.abs(out[0] - ref).max())
    print(f"int8 dot max |err| vs int32 reference: {err}", flush=True)


run("bf16 x bf16 -> f32 (baseline)", jnp.bfloat16, jnp.bfloat16,
    jnp.float32)
run("int8 x int8 -> int32", jnp.int8, jnp.int8, jnp.int32)
run("f32->int8 quant + int8 dot", jnp.float32, jnp.int8, jnp.int32,
    quantize=True)
check_numerics()
