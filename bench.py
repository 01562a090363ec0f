"""Benchmark harness: restored frames/sec/chip on the guided sampler.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Measures the steady-state latency of ONE jitted guided DDPM step (UNet
forward + SRConv data-consistency + FLAIR update, exactly the lax.scan body
of flair_tpu.diffusion.sampler.guided_sample_loop) on the flagship
BicubicUNet at 512², 10 frames, and reports frames/sec for the full 100-step
window restoration (the honest demo workload, scripts/video_sample.py demo
geometry). MFU is computed from the XLA-reported FLOPs of the compiled step
against the chip's peak (TPU v5e: 197 TFLOP/s bf16).

Tractability (round-1 bench timed out in compile):
- persistent compilation cache at .jax_cache/ (first compile is slow; all
  later runs — including the driver's — hit the cache);
- params are materialised as zeros from jax.eval_shape (no init compile);
- the timed unit is the single scanned step, so only one XLA program is
  compiled.

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
driver-pinned target is ≥5× an A100's frames/sec. We report value / 0.1
where 0.1 fps/chip is the class estimate for a 100-step 512² guided window
on a single A100 (unmeasured; field kept for cross-round tracking).
"""

from __future__ import annotations

import json
import os
import sys
import time

V5E_PEAK_BF16 = 197e12  # TPU v5 lite peak bf16 FLOP/s per chip
_PEAKS = {
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "512"))
    frames = int(os.environ.get("BENCH_FRAMES", "10"))
    iters = int(os.environ.get("BENCH_STEPS", "5"))
    total_steps = 100

    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp

    from flair_tpu.diffusion import (
        GuidanceConfig,
        guidance_tables,
        make_task_diffusion,
        p_sample,
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

    d = make_task_diffusion("x8_bicubic", str(total_steps))
    cfg = GuidanceConfig(use_aux=False, rho=0.85, w=0.85)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, frames, size, size, 3), jnp.float32)
    lvl = jnp.full((1, frames), 0.5, jnp.float32)

    # zero params straight from shapes: avoids compiling a full init forward
    shapes = jax.eval_shape(model.init, rng, x, lvl, x)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )
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

    _, ws, gammas, start_ts = guidance_tables(d, cfg)
    ws_dev, gammas_dev = jnp.asarray(ws), jnp.asarray(gammas)

    def one_step(xx, t, key):
        """Exactly the guided_sample_loop scan body (sampler.py:199-221)."""
        z = jax.random.normal(key, xx.shape, xx.dtype)
        model_out = model_fn(xx, t)
        sample, _ = p_sample(
            d, model_out, xx, t, z,
            w_t=jnp.take(ws_dev, t),
            gamma_t=jnp.take(gammas_dev, t),
            rho=cfg.rho,
            in_face_window=jnp.asarray(False),
            clip_denoised=True,
            restore_fn=restore_fn,
        )
        return sample

    jit_step = jax.jit(one_step, donate_argnums=(0,))
    args = (x, jnp.asarray(total_steps // 2, jnp.int32), jax.random.PRNGKey(1))

    t0 = time.time()
    lowered = jit_step.lower(*args)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s (cache: {cache_dir})", file=sys.stderr)

    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass

    # warm-up execution then timing loop
    out = compiled(x, args[1], args[2])
    out.block_until_ready()
    t0 = time.time()
    cur = out
    for i in range(iters):
        cur = compiled(cur, args[1], jax.random.PRNGKey(2 + i))
    cur.block_until_ready()
    per_step = (time.time() - t0) / iters
    fps = frames / (per_step * total_steps)

    kind = jax.devices()[0].device_kind
    peak = _PEAKS.get(kind, V5E_PEAK_BF16)
    mfu = (flops / per_step / peak) if flops else None

    result = {
        "metric": "restored_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": f"frames/s ({size}px, 100-step guided window, {frames} frames)",
        "vs_baseline": round(fps / 0.1, 3),
        "per_step_ms": round(per_step * 1e3, 2),
        "step_tflops": round(flops / 1e12, 2) if flops else None,
        "mfu": round(mfu, 4) if mfu else None,
        "compile_s": round(compile_s, 1),
        "device": kind,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
