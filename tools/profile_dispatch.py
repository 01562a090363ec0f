"""Sampler dispatch-mode comparison on the real chip (VERDICT r2 #7).

Times ONE full guided window (25 respaced steps) dispatched two ways over
the identical computation:
- "steps":  two jitted programs per step (model fwd + guidance update),
  host loop — the production default;
- "scan_p": the whole window as one jitted lax.scan program with every
  window tensor a runtime argument.

The delta is the per-step host dispatch overhead (~2 dispatches/step
through the axon tunnel) vs whatever XLA gains scheduling across steps.
Run at a mid-size config (128², 4 frames) so the per-step compute doesn't
drown the dispatch term; scale the conclusion by the 512² step cost.

Output: ms/window for both modes + derived per-step overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

# honor JAX_PLATFORMS for off-TPU validation: this machine's sitecustomize
# registers the axon plugin at startup and the env var alone doesn't switch
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# serialize chip users (resident bench loop / measurement queue / driver
# bench) behind the cooperative single-chip lock; block — the queue runs
# this profiler deliberately and should wait its turn, not skip
from flair_tpu.utils.locking import acquire_tpu_lock, tpu_lock_needed

if tpu_lock_needed() and acquire_tpu_lock(timeout_s=3600.0) is None:
    sys.exit("chip lock busy for 1h; aborting profile run")

SIZE = int(os.environ.get("DISPATCH_SIZE", "128"))
FRAMES = int(os.environ.get("DISPATCH_FRAMES", "4"))
STEPS = os.environ.get("DISPATCH_STEPS", "ddim25")
REPS = int(os.environ.get("DISPATCH_REPS", "3"))


def main() -> int:
    from bench import _rand_params, _readback_overhead_ms

    from flair_tpu.diffusion import (
        GuidanceConfig, guided_sample_loop, guided_sample_steps,
        make_guided_update, make_task_diffusion,
    )
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.operators.factory import get_operator, make_restore_fn_p
    from flair_tpu.pipeline.wrappers import wrap_bicubic_model

    overhead = _readback_overhead_ms()
    print(f"# readback overhead: {overhead:.1f} ms", flush=True)

    scale = SIZE / 512
    model = BicubicUNet(
        inner_channel=64, norm_groups=16, channel_mults=(1, 2, 4, 8, 16),
        attn_res=(max(int(64 * scale), 4), max(int(32 * scale), 2)),
        vsrpp_res=(int(512 * scale), int(256 * scale)), image_size=SIZE,
        res_blocks=1, num_frames=7, head_dim=64, temporal_attn=True,
        cross_frame_module=True, dtype=jnp.bfloat16,
    )
    d = make_task_diffusion("x8_bicubic", STEPS)
    rule = "ddim" if STEPS.startswith("ddim") else "ddpm"
    cfg = GuidanceConfig(use_aux=False, rho=0.85, w=0.85, tau=1)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        key, (1, FRAMES, SIZE, SIZE, 3), jnp.float32) * 2 - 1
    lvl = jnp.full((1, FRAMES), 0.5, jnp.float32)
    params = _rand_params(jax.eval_shape(model.init, key, x, lvl, x))

    op = get_operator("x8_bicubic", SIZE)
    lr = op.A(x.reshape(FRAMES, -1)).reshape(FRAMES, SIZE // 8, SIZE // 8, 3)
    restore_p = make_restore_fn_p("x8_bicubic", op)

    def restore_fn_p(x0, degraded):
        flat = x0.reshape((x0.shape[0] * x0.shape[1],) + x0.shape[2:])
        return restore_p(flat, degraded).reshape(x0.shape)

    apply = wrap_bicubic_model(d, model, params)
    flows = jax.jit(apply.flows_fn)(x)
    jit_apply = jax.jit(apply.apply_p)
    update = jax.jit(make_guided_update(
        d, cfg, restore_fn=restore_fn_p, rule=rule))
    readout = jax.jit(lambda s: s.astype(jnp.float32).mean())

    # --- steps mode: host loop, 2 programs/step --------------------------
    def window_steps():
        def model_fn(xx, t):
            return jit_apply(params, xx, t, x, x, None, flows)

        s = guided_sample_steps(
            d, model_fn, x, jax.random.PRNGKey(1), cfg,
            update=update, restore_args=(lr,), face_args=None,
            rule=rule,
        )
        return float(readout(s))

    t0 = time.time()
    window_steps()
    print(f"# steps compile+warmup: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        window_steps()
        ts.append(time.time() - t0)
    steps_ms = min(ts) * 1e3 - overhead
    print(f"steps  window: {steps_ms:9.1f} ms", flush=True)

    # --- scan_p mode: one program, tensors as args -----------------------
    def window_program(params, noise, k, low, flows, degraded):
        def model_fn(xx, t):
            return apply.apply_p(params, xx, t, low, low, None, flows)

        return guided_sample_loop(
            d, model_fn, noise, k, cfg,
            restore_fn=lambda x0: restore_fn_p(x0, degraded),
            rule=rule,
        ).astype(jnp.float32).mean()

    scan_p = jax.jit(window_program)
    t0 = time.time()
    float(scan_p(params, x, jax.random.PRNGKey(1), x, flows, lr))
    print(f"# scan_p compile+warmup: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        float(scan_p(params, x, jax.random.PRNGKey(1), x, flows, lr))
        ts.append(time.time() - t0)
    scan_ms = min(ts) * 1e3 - overhead
    print(f"scan_p window: {scan_ms:9.1f} ms", flush=True)

    n = d.num_timesteps
    print(f"per-step dispatch overhead (steps - scan_p)/{n}: "
          f"{(steps_ms - scan_ms)/n:7.2f} ms/step", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
