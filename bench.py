"""Benchmark harness: restored frames/sec/chip on the guided sampler.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures the steady-state per-step latency of the jitted guided DDPM step
(UNet forward + data-consistency operator inside one lax.scan step) on the
flagship BicubicUNet, then reports frames/sec for a full 100-step window
restoration. ``vs_baseline``: the reference publishes no numbers
(BASELINE.md); the driver-pinned target is ≥5× an A100's frames/sec. We
report vs_baseline as value / A100_EST where A100_EST is the reference
single-GPU estimate recorded in BASELINE.json driver notes (0.1 fps/chip
class for a 100-step 512² guided window — unmeasured here; field kept for
cross-round tracking).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "512"))
    frames = int(os.environ.get("BENCH_FRAMES", "10"))
    steps_measure = int(os.environ.get("BENCH_STEPS", "3"))
    total_steps = 100

    import jax
    import jax.numpy as jnp

    from flair_tpu.diffusion import (
        GuidanceConfig,
        guided_sample_loop,
        make_task_diffusion,
        sr3_noise_level,
    )
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.operators.factory import get_operator, make_restore_fn

    scale = size / 512
    model = BicubicUNet(
        inner_channel=64,
        norm_groups=16,
        channel_mults=(1, 2, 4, 8, 16),
        attn_res=(max(int(64 * scale), 4), max(int(32 * scale), 2)),
        vsrpp_res=(int(512 * scale), int(256 * scale)),
        image_size=size,
        res_blocks=1,
        num_frames=7,
        head_dim=64,
        temporal_attn=True,
        cross_frame_module=True,
        dtype=jnp.bfloat16,
    )

    d = make_task_diffusion("x8_bicubic", str(steps_measure))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, frames, size, size, 3), jnp.float32)
    lvl = jnp.full((1, frames), 0.5, jnp.float32)
    params = model.init(rng, x, lvl, x)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"# params: {n_params/1e6:.1f}M", file=sys.stderr)

    op = get_operator("x8_bicubic", size)
    lr = op.A(x.reshape(frames, -1)).reshape(1, frames, size // 8, size // 8, 3)
    restore = make_restore_fn("x8_bicubic", op, lr.reshape(frames, *lr.shape[2:]))

    def restore_fn(x0):
        flat = x0.reshape((x0.shape[0] * x0.shape[1],) + x0.shape[2:])
        return restore(flat).reshape(x0.shape)

    def model_fn(xx, t):
        lv = jnp.full((1, frames), sr3_noise_level(d, t), jnp.float32)
        return model.apply(params, xx, lv, x, rnn_input=x)

    f = jax.jit(
        lambda noise, r: guided_sample_loop(
            d, model_fn, noise, r,
            GuidanceConfig(use_aux=False, rho=0.85, w=0.85),
            restore_fn=restore_fn,
        )
    )
    noise = jnp.zeros_like(x)
    t0 = time.time()
    out = f(noise, jax.random.PRNGKey(1))
    out.block_until_ready()
    compile_s = time.time() - t0
    print(f"# compile+first: {compile_s:.1f}s", file=sys.stderr)

    t0 = time.time()
    out = f(noise, jax.random.PRNGKey(2))
    out.block_until_ready()
    elapsed = time.time() - t0
    per_step = elapsed / steps_measure
    fps = frames / (per_step * total_steps)

    result = {
        "metric": "restored_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": f"frames/s ({size}px, 100-step guided window, {frames} frames)",
        "vs_baseline": round(fps / 0.1, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
