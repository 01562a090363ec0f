"""Benchmark harness: restored frames/sec/chip on the guided sampler.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Measures the steady-state latency of ONE guided DDPM step exactly as the
pipeline dispatches it — the two-program pair (jitted denoiser forward +
jitted guidance update, flair_tpu.diffusion.sampler.guided_sample_steps)
— at the demo geometry (512², 10 frames, 100 respaced steps,
scripts/video_sample.py:202-203,361-368):

- ``per_step_ms``       BicubicUNet (x8_bicubic) + SRConv consistency;
- ``per_step_ms_face``  same step inside the face window (τ..t_start):
  + CodeFormer + ParseNet + affine crop/paste on device
  (gaussian_diffusion.py:471-496 path);
- ``per_step_ms_blur``  BlurUNet (gaussian) + pseudoSR consistency.

Honesty rules (VERDICT r1): timing pulls a scalar to host every iteration
(`block_until_ready` does not reliably synchronise through this machine's
axon tunnel, PERF.md), minus the measured readback overhead; params and
inputs are RANDOM (zero flows would give every deformable-conv patch
anchor degenerate HBM locality that real flows don't have).

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


def _readback_overhead_ms() -> float:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x.sum())
    z = jnp.zeros((8, 128), jnp.float32)
    float(f(z))
    ts = []
    for _ in range(5):
        t0 = time.time()
        float(f(z))
        ts.append(time.time() - t0)
    return min(ts) * 1e3


def _time_step(compiled, args, iters, overhead_ms):
    """Readback-timed: every iteration forces a scalar to host."""
    ts = []
    for i in range(iters):
        t0 = time.time()
        float(compiled(*args))
        ts.append(time.time() - t0)
    return min(ts) - overhead_ms / 1e3


def _rand_params(shapes, seed=3, scale=0.02):
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    vals = [
        jax.random.normal(k, s.shape, s.dtype) * jnp.asarray(scale, s.dtype)
        for k, s in zip(keys, leaves)
    ]
    return jax.tree_util.tree_unflatten(treedef, vals)


def _bicubic_step(size, frames, use_face, batch=1):
    """Build the x8_bicubic guided step EXACTLY as the pipeline runs it:
    two jitted programs (denoiser forward via wrap_bicubic_model.apply_p,
    guidance update via make_guided_update) with params, conditioning,
    observations, face weights and flows all as runtime ARGUMENTS.

    Closure-captured arrays would lower as constants embedded in the HLO —
    half a GB of proto for the 236M-param model — and this machine's remote
    XLA compile service dies on monolithic programs that large (PERF.md);
    the split also shares its compile cache with the CLI pipeline.

    Returns (step, args) where step(*args) runs model+update and returns
    the sample (device array).
    """
    import jax
    import jax.numpy as jnp

    from flair_tpu.diffusion import (
        GuidanceConfig, make_guided_update, make_task_diffusion,
    )
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.operators.factory import get_operator, make_restore_fn_p
    from flair_tpu.pipeline.wrappers import wrap_bicubic_model

    scale = size / 512
    model = BicubicUNet(
        inner_channel=64, norm_groups=16, channel_mults=(1, 2, 4, 8, 16),
        attn_res=(max(int(64 * scale), 4), max(int(32 * scale), 2)),
        vsrpp_res=(int(512 * scale), int(256 * scale)), image_size=size,
        res_blocks=1, num_frames=7, head_dim=64, temporal_attn=True,
        cross_frame_module=True, dtype=jnp.bfloat16,
    )
    d = make_task_diffusion("x8_bicubic", "100")
    cfg = GuidanceConfig(use_aux=use_face, rho=0.85, w=0.85)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        key, (batch, frames, size, size, 3), jnp.float32) * 2 - 1
    lvl = jnp.full((batch, frames), 0.5, jnp.float32)
    shapes = jax.eval_shape(model.init, key, x, lvl, x)
    params = _rand_params(shapes)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"# bicubic params: {n_params/1e6:.1f}M", file=sys.stderr)

    op = get_operator("x8_bicubic", size)
    lr = op.A(x.reshape(batch * frames, -1)).reshape(
        batch * frames, size // 8, size // 8, 3)
    restore_p = make_restore_fn_p("x8_bicubic", op)

    def restore_fn_p(x0, degraded):
        flat = x0.reshape((x0.shape[0] * x0.shape[1],) + x0.shape[2:])
        return restore_p(flat, degraded).reshape(x0.shape)

    face_fn_param = None
    face_args = None
    if use_face:
        import numpy as np

        from flair_tpu.face.helper import make_face_fn_p
        from flair_tpu.models.codeformer import CodeFormer
        from flair_tpu.models.parsenet import ParseNet

        cf = CodeFormer(
            latent_size=(size // 32) ** 2,
            connect_list=tuple(
                str(r) for r in (32, 64, 128, 256) if r <= size // 2
            ),
            dtype=jnp.bfloat16,
        )
        pn = ParseNet()
        face = jnp.zeros((frames, size, size, 3), jnp.float32)
        cf_params = _rand_params(jax.eval_shape(
            lambda k, f: cf.init(k, f, w=1.0, adain=True), key, face))
        pn_params = _rand_params(jax.eval_shape(pn.init, key, face))
        mats = jnp.asarray(np.tile(
            np.asarray([[1.1, 0.08, 12.0], [-0.08, 1.1, -9.0]], np.float32),
            (frames, 1, 1)))

        def face_fn_param(x0, xt, mats_dev, cfp, pnp):
            fn_p = make_face_fn_p(
                lambda f: cf.apply(cfp, f, w=1.0, adain=True)[0],
                lambda f: pn.apply(pnp, f)[0],
                face_size=size,
            )
            return fn_p(x0, xt, mats_dev)

        face_args = (mats, cf_params, pn_params)

    apply = wrap_bicubic_model(d, model, params)
    flows = jax.jit(apply.flows_fn)(x)
    jit_apply = jax.jit(apply.apply_p)
    update = jax.jit(make_guided_update(
        d, cfg, restore_fn=restore_fn_p, face_fn=face_fn_param))
    readout = jax.jit(lambda s: s.astype(jnp.float32).mean())

    def step(params, xx, cond, lr_obs, t, key, flows, face_args):
        model_out = jit_apply(params, xx, t, cond, cond, None, flows)
        sample, _ = update(xx, model_out, t, key, None, None,
                           (lr_obs,), face_args)
        return readout(sample)

    args = (params, x, x, lr, jnp.asarray(50, jnp.int32),
            jax.random.PRNGKey(1), flows, face_args)

    def flops_fn():
        c = jit_apply.lower(params, x, jnp.asarray(50, jnp.int32), x, x,
                            None, flows).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None

    return step, args, flops_fn


def _blur_step(size, frames):
    """gaussian-task guided step (BlurUNet + pseudoSR), two-program form —
    see _bicubic_step for why everything enters as arguments."""
    import jax
    import jax.numpy as jnp

    from flair_tpu.diffusion import (
        GuidanceConfig, make_guided_update, make_task_diffusion,
    )
    from flair_tpu.models.adm import BlurUNet
    from flair_tpu.operators.factory import get_operator, make_restore_fn_p
    from flair_tpu.pipeline.wrappers import wrap_blur_model

    scale = size / 512
    model = BlurUNet(
        image_size=size,
        model_channels=128,
        channel_mult=(0.5, 1, 1, 2, 2, 4, 4),
        attention_resolutions=(16, 32, 64),
        rnn_resolutions=(1, 2),
        temporal_frames=5,
        num_head_channels=64,
        dtype=jnp.bfloat16,
    )
    d = make_task_diffusion("gaussian", "100")
    cfg = GuidanceConfig(use_aux=False, rho=0.25, w=0.75, zeta=1.0,
                         noise_level=2.55)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, frames, size, size, 3), jnp.float32) * 2 - 1
    low = x
    ts0 = jnp.zeros((1, frames), jnp.int32)
    shapes = jax.eval_shape(model.init, key, x, ts0, low, rnn_input=low)
    params = _rand_params(shapes)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"# blur params: {n_params/1e6:.1f}M", file=sys.stderr)

    op = get_operator("gaussian", size)
    lr = op.A(x.reshape(frames, size, size, 3))
    restore_p = make_restore_fn_p("gaussian", op)

    def restore_fn_p(x0, degraded):
        flat = x0.reshape((x0.shape[0] * x0.shape[1],) + x0.shape[2:])
        return restore_p(flat, degraded).reshape(x0.shape)

    apply = wrap_blur_model(d, model, params)
    flows = jax.jit(apply.flows_fn)(low)
    jit_apply = jax.jit(apply.apply_p)
    update = jax.jit(make_guided_update(d, cfg, restore_fn=restore_fn_p))
    readout = jax.jit(lambda s: s.astype(jnp.float32).mean())

    def step(params, xx, cond, lr_obs, t, key, flows):
        model_out = jit_apply(params, xx, t, cond, cond, None, flows)
        sample, _ = update(xx, model_out, t, key, None, None,
                           (lr_obs,), None)
        return readout(sample)

    args = (params, x, low, lr, jnp.asarray(50, jnp.int32),
            jax.random.PRNGKey(1), flows)

    def flops_fn():
        c = jit_apply.lower(params, x, jnp.asarray(50, jnp.int32), low, low,
                            None, flows).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None

    return step, args, flops_fn


def main() -> int:
    size = int(os.environ.get("BENCH_SIZE", "512"))
    frames = int(os.environ.get("BENCH_FRAMES", "10"))
    iters = int(os.environ.get("BENCH_STEPS", "4"))
    total_steps = 100

    import jax

    # honor JAX_PLATFORMS=cpu for off-TPU validation runs: this machine's
    # sitecustomize registers the axon TPU plugin at interpreter startup,
    # so the env var alone does not switch backends
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    overhead = _readback_overhead_ms()
    print(f"# readback overhead: {overhead:.1f} ms", file=sys.stderr)

    # --- primary: BicubicUNet x8 step (driver metric) --------------------
    fn, args, flops_fn = _bicubic_step(size, frames, use_face=False)
    t0 = time.time()
    float(fn(*args))  # first call compiles model + update + readout
    compile_s = time.time() - t0
    print(f"# bicubic compile+warmup: {compile_s:.1f}s", file=sys.stderr)
    flops = None
    try:
        flops = flops_fn()
    except Exception:
        pass
    per_step = _time_step(fn, args, iters, overhead)
    fps = frames / (per_step * total_steps)

    extras = {}
    nb = int(os.environ.get("BENCH_BATCH", "0"))
    if nb > 1:
        # serving-throughput variant: nb INDEPENDENT windows restored
        # concurrently (clips are independent in production; within one
        # clip windows are sequential through prev_recon). Latency per
        # step grows sub-linearly — per-call fixed costs amortise.
        try:
            fb, ab, _ = _bicubic_step(size, frames, use_face=False, batch=nb)
            t0 = time.time()
            float(fb(*ab))
            print(f"# batch{nb} compile+warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            tb = _time_step(fb, ab, max(2, iters // 2), overhead)
            extras[f"per_step_ms_b{nb}"] = round(tb * 1e3, 2)
            extras[f"fps_batch{nb}"] = round(nb * frames / (tb * total_steps), 4)
        except Exception as e:  # noqa: BLE001
            extras[f"per_step_ms_b{nb}"] = None
            print(f"# batch{nb} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    for tag, builder in (
        ("face", lambda: _bicubic_step(size, frames, use_face=True)),
        ("blur", lambda: _blur_step(size, frames)),
    ):
        if os.environ.get("BENCH_SKIP_" + tag.upper()):
            continue
        try:
            f2, a2, _ = builder()
            t0 = time.time()
            float(f2(*a2))
            print(f"# {tag} compile+warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            extras[f"per_step_ms_{tag}"] = round(
                _time_step(f2, a2, max(2, iters // 2), overhead) * 1e3, 2)
        except Exception as e:  # noqa: BLE001 — report partial results
            extras[f"per_step_ms_{tag}"] = None
            print(f"# {tag} step failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

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
        **extras,
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
