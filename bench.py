"""Benchmark harness: restored frames/sec/chip on the guided sampler.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric (BASELINE.json: "restored frames/sec/chip (DDIM)"): the
steady-state latency of ONE guided step exactly as the pipeline dispatches
it — the two-program pair (jitted denoiser forward + jitted guidance
update, flair_tpu.diffusion.sampler.guided_sample_steps) — at the demo
geometry (512², 10 frames, scripts/video_sample.py:202-203,361-368),
converted to frames/s for the 25-step respaced guided DDIM serving config
(``--sampler ddim --steps 25``; respacing per respace.py:23-31).

The HEADLINE is the demo-equivalent configuration: the reference demo
always applies the CodeFormer face prior inside the guided window
(scripts/video_sample.py:446-479, gaussian_diffusion.py:471-496), so
``value`` blends the face-window step over the schedule using the
pipeline's own tau arithmetic (pipeline.video.scale_tau: face fusion
active for t ∈ [τ, t_start]). If the face variant fails to measure, the
headline falls back to the face-off number and the unit SAYS so.

- ``value``             frames/s = frames / (25 · blended per-step), face on
- ``per_step_ms``       one face-off guided step, η-DDIM update
- ``per_step_ms_face``  step inside the face window (+ CodeFormer +
                        ParseNet + affine crop/paste on device)
- ``value_noface``      the face-off headline (r1-r3 continuity)
- ``fps_ddpm100``       face-off step under the reference's 100-step DDPM
                        schedule (round-1/2 continuity metric)
- ``per_step_ms_blur``  BlurUNet (gaussian) + pseudoSR consistency step
- ``value_blur``        gaussian-task frames/s, demo-equivalent face-ON
                        blend (``value_blur_noface`` keeps the r3/r4
                        face-off continuity number)
- ``per_step_ms_jpeg``  jpeg-task step (adds the differentiable JPEG
                        round-trip in the consistency op)
- ``fps_batch{N}``      N independent windows restored concurrently

Resilience (VERDICT r2 #1/#5): this machine's axon TPU tunnel dies for
hours at a time — round 2 lost its number to a single rc=1. The measuring
run therefore executes in a CHILD subprocess; the parent retries
backend-unavailable failures with backoff inside ``BENCH_WAIT_S`` (default
30 min — sized for unattended driver runs; resident runs pass 12 h), a
watchdog converts a hung backend init into a prompt retriable exit
(``BENCH_PROBE_TIMEOUT``, default 5 min), and on final failure the parent
emits the last successful record from
``.bench_last.json`` marked ``"stale": true`` (or a structured error
record) with rc=0 — the driver always gets parseable JSON.

Honesty rules (VERDICT r1): timing pulls a scalar to host every iteration
(`block_until_ready` does not reliably synchronise through this machine's
axon tunnel, PERF.md), minus the measured readback overhead; params and
inputs are RANDOM (zero flows would give every deformable-conv patch
anchor degenerate HBM locality that real flows don't have).

``vs_baseline``: the reference publishes no numbers (BASELINE.md); the
driver-pinned target is ≥5× an A100's frames/sec. The class estimate is
0.1 fps/chip for a *100-step* 512² guided window on a single A100
(unmeasured; kept for cross-round tracking). Respacing is equally
available to the reference, so the denominator scales with the serving
schedule: vs_baseline = value / (0.1 · 100 / SERVING_STEPS) — the ratio
compares equal-step-count configs and cannot be inflated by schedule
choice alone.

Roofline context (VERDICT r2 #9): ``ideal_step_ms`` = step FLOPs at the
chip's peak bf16 rate; ``floor_step_ms`` = PERF.md's gather-bound cost
model for the current DCN formulation (~60 DCN calls at 512² + 60 at 256²
per step at their measured per-call floors) — progress against the
formulation floor, not just against peak FLOPs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

V5E_PEAK_BF16 = 197e12  # TPU v5 lite peak bf16 FLOP/s per chip
_PEAKS = {
    "TPU v5 lite": 197e12,
    "TPU v5": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}
_HERE = os.path.dirname(os.path.abspath(__file__))
_LAST = os.path.join(_HERE, ".bench_last.json")

# PERF.md cost model: practical floor of the tile-DCN formulation per
# guided 512²/10f step. Round-3 measured per-call floors: 60·~45ms @512²
# (52 measured, ~7 recoverable via the documented pixel-major coordinate
# layout) + 60·~4ms @256² + flow_warp ~0.65s + convs/attn/update ~1.0s
# ≈ 4.6 s. Revise when the kernel levers move the per-call floor.
FORMULATION_FLOOR_MS = 4600.0

SERVING_STEPS = int(os.environ.get("BENCH_NSTEPS", "25"))


def _bench_config() -> dict:
    """The env knobs that change what a record MEASURES. Saved with every
    record; a stale fallback is only valid if they match (a blur_exact
    probe run must not become the next default run's headline)."""
    return {
        "size": int(os.environ.get("BENCH_SIZE", "512")),
        "frames": int(os.environ.get("BENCH_FRAMES", "10")),
        "nsteps": SERVING_STEPS,
        "dcn": os.environ.get("BENCH_DCN", "auto"),
        "batch": int(os.environ.get("BENCH_BATCH", "2")),
        "platform": os.environ.get("JAX_PLATFORMS", "axon"),
    }


def _config_key() -> str:
    return json.dumps(_bench_config(), sort_keys=True)


def _is_backend_err(e: BaseException) -> bool:
    s = f"{type(e).__name__}: {e}"
    return any(k in s for k in (
        "UNAVAILABLE", "Unable to initialize backend", "DEADLINE_EXCEEDED",
        "Socket closed", "failed to connect", "Connection reset"))


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
    """Readback-timed: every iteration forces a scalar to host. Clamped to
    a positive floor — a noisy overhead estimate must not produce zero or
    negative latency (ADVICE r2)."""
    ts = []
    for i in range(iters):
        t0 = time.time()
        float(compiled(*args))
        ts.append(time.time() - t0)
    return max(min(ts) - overhead_ms / 1e3, 1e-4)


def _dcn_kwargs():
    """BENCH_DCN=auto|tile|patch|exact selects the deformable-conv path
    (VERDICT r2 #4: time the --exact-dcn fallback): 'exact' is the
    per-sample gather (dcn_patch_size=None), 'patch' forces the XLA
    patch-gather, 'tile' forces the Pallas kernel; default 'auto'."""
    mode = os.environ.get("BENCH_DCN", "auto")
    if mode == "exact":
        return {"dcn_patch_size": None, "dcn_impl": "patch"}
    if mode == "patch":
        return {"dcn_impl": "patch"}
    if mode == "tile":
        return {"dcn_impl": "tile"}
    return {}


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

    Returns (make_step, args, flops_fn): ``make_step(rule)`` builds the
    full step (forward + rule's update + readout) for rule ∈ {"ddpm",
    "ddim"}; the heavy forward program is shared between rules.
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
        **_dcn_kwargs(),
    )
    from flair_tpu.pipeline.video import TASK_CONFIGS, scale_tau

    d = make_task_diffusion("x8_bicubic", "100")
    d_ddim = make_task_diffusion("x8_bicubic", f"ddim{SERVING_STEPS}")
    cfg = GuidanceConfig(use_aux=use_face, rho=0.85, w=0.85)
    # tau via the pipeline's own schedule arithmetic (demo tau=5 at 100
    # steps, video_sample.py:521-532, rescaled to the serving schedule)
    cfg_ddim = GuidanceConfig(
        use_aux=use_face, rho=0.85, w=0.85,
        tau=scale_tau(TASK_CONFIGS["x8_bicubic"].tau, SERVING_STEPS))
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
        # bf16 like the CLI production face stack (cli.build_face_stack);
        # f32 here made the bench's face delta pay a dtype premium the
        # pipeline doesn't (VERDICT r3 #4)
        pn = ParseNet(dtype=jnp.bfloat16)
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
    readout = jax.jit(lambda s: s.astype(jnp.float32).mean())
    updates = {
        "ddpm": jax.jit(make_guided_update(
            d, cfg, restore_fn=restore_fn_p, face_fn=face_fn_param)),
        # the serving config: 25-step respaced schedule, η=0 DDIM update.
        # NOTE the ddim update indexes the RESPACED tables, so its t must be
        # a spaced index in [0, 25); the model conditioning inside apply_p
        # maps spaced t → original t (respace.py:155-167 semantics) for d,
        # which differs from d_ddim — for TIMING purposes the forward cost
        # is conditioning-independent (same program, same shapes).
        "ddim": jax.jit(make_guided_update(
            d_ddim, cfg_ddim, restore_fn=restore_fn_p,
            face_fn=face_fn_param, rule="ddim", eta=0.0)),
    }
    t_mid = {"ddpm": 50, "ddim": SERVING_STEPS // 2}

    def make_step(rule):
        update = updates[rule]

        def step(params, xx, cond, lr_obs, t, key, flows, face_args):
            model_out = jit_apply(params, xx, t, cond, cond, None, flows)
            sample, _ = update(xx, model_out, t, key, None, None,
                               (lr_obs,), face_args)
            return readout(sample)

        args = (params, x, x, lr, jnp.asarray(t_mid[rule], jnp.int32),
                jax.random.PRNGKey(1), flows, face_args)
        return step, args

    def flops_fn():
        c = jit_apply.lower(params, x, jnp.asarray(50, jnp.int32), x, x,
                            None, flows).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None

    return make_step, flops_fn


def _blur_step(size, frames, task="gaussian", use_face=False):
    """gaussian/jpeg-task guided step (BlurUNet + pseudoSR), two-program
    form — see _bicubic_step for why everything enters as arguments.

    ``task='jpeg'`` swaps in the JPEG operator + its guidance hypers
    (pseudoSR.py:266-281 adds a differentiable JPEG round-trip the
    gaussian consistency step does not pay — VERDICT r4 #3 demands it be
    timed, not assumed equal). ``use_face=True`` adds the CodeFormer +
    ParseNet face-prior program to the step, exactly as the reference
    demo applies it to the gaussian/jpeg tasks too
    (scripts/demo.bash:4-5, video_sample.py:446-479)."""
    import jax
    import jax.numpy as jnp

    from flair_tpu.diffusion import (
        GuidanceConfig, make_guided_update, make_task_diffusion,
    )
    from flair_tpu.models.adm import BlurUNet
    from flair_tpu.operators.factory import get_operator, make_restore_fn_p
    from flair_tpu.pipeline.video import TASK_CONFIGS
    from flair_tpu.pipeline.wrappers import wrap_blur_model

    model = BlurUNet(
        image_size=size,
        model_channels=128,
        channel_mult=(0.5, 1, 1, 2, 2, 4, 4),
        attention_resolutions=(16, 32, 64),
        rnn_resolutions=(1, 2),
        temporal_frames=5,
        num_head_channels=64,
        dtype=jnp.bfloat16,
        **_dcn_kwargs(),
    )
    tc = TASK_CONFIGS[task]
    d = make_task_diffusion(task, "100")
    cfg = GuidanceConfig(use_aux=use_face, rho=tc.rho, w=tc.w,
                         zeta=tc.zeta, noise_level=tc.noise_level)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (1, frames, size, size, 3), jnp.float32) * 2 - 1
    low = x
    ts0 = jnp.zeros((1, frames), jnp.int32)
    shapes = jax.eval_shape(model.init, key, x, ts0, low, rnn_input=low)
    params = _rand_params(shapes)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
    print(f"# blur params: {n_params/1e6:.1f}M", file=sys.stderr)

    op = get_operator(task, size)
    lr = op.A(x.reshape(frames, size, size, 3))
    restore_p = make_restore_fn_p(task, op, jpeg_qf=tc.jpeg_qf)

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
        pn = ParseNet(dtype=jnp.bfloat16)
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

    apply = wrap_blur_model(d, model, params)
    flows = jax.jit(apply.flows_fn)(low)
    jit_apply = jax.jit(apply.apply_p)
    update = jax.jit(make_guided_update(
        d, cfg, restore_fn=restore_fn_p, face_fn=face_fn_param))
    readout = jax.jit(lambda s: s.astype(jnp.float32).mean())

    def step(params, xx, cond, lr_obs, t, key, flows, face_args):
        model_out = jit_apply(params, xx, t, cond, cond, None, flows)
        sample, _ = update(xx, model_out, t, key, None, None,
                           (lr_obs,), face_args)
        return readout(sample)

    args = (params, x, low, lr, jnp.asarray(50, jnp.int32),
            jax.random.PRNGKey(1), flows, face_args)

    def flops_fn():
        c = jit_apply.lower(params, x, jnp.asarray(50, jnp.int32), low, low,
                            None, flows).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None

    return step, args, flops_fn


def _child_main() -> int:
    """The actual measuring run (executes on the device; may die with the
    tunnel). rc=42 signals 'backend unavailable, retry me'."""
    size = int(os.environ.get("BENCH_SIZE", "512"))
    frames = int(os.environ.get("BENCH_FRAMES", "10"))
    iters = int(os.environ.get("BENCH_STEPS", "4"))

    # single-chip coordination: the resident retry loop, the measurement
    # queue and the driver's own bench run can all be alive at once, and a
    # client killed mid-op wedges the tunnel for hours — serialize chip
    # users behind a cooperative flock. Busy → retriable exit (42): the
    # parent backs off and tries again, and on budget exhaustion serves
    # the (by then usually fresh) per-config stale record.
    from flair_tpu.utils.locking import acquire_tpu_lock, tpu_lock_needed

    if tpu_lock_needed() and acquire_tpu_lock(timeout_s=30.0) is None:
        print("# TPU chip lock busy (another measurement run owns the "
              "chip); retriable", file=sys.stderr)
        return 42

    import jax

    # honor JAX_PLATFORMS=cpu for off-TPU validation runs: this machine's
    # sitecustomize registers the axon TPU plugin at interpreter startup,
    # so the env var alone does not switch backends
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_HERE, ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    # backend probe: fail fast (and retriably) before building models.
    # A wedged tunnel HANGS backend init for tens of minutes rather than
    # erroring — a watchdog turns that into a prompt retriable exit so a
    # retry cycle costs ~5 min, not the whole child timeout. (A tunnel
    # that is UP completes the probe in seconds; a mid-compile run is
    # never killed because the watchdog is cancelled after the probe.)
    import threading

    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    probe_done = threading.Event()

    def _watchdog():
        if not probe_done.wait(probe_timeout):
            print(f"# backend probe hung >{probe_timeout:.0f}s; "
                  "treating as unavailable", file=sys.stderr)
            sys.stderr.flush()
            os._exit(42)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        overhead = _readback_overhead_ms()
    except Exception as e:  # noqa: BLE001
        print(f"# backend probe failed: {type(e).__name__}: {e}",
              file=sys.stderr)
        return 42
    finally:
        probe_done.set()
    print(f"# readback overhead: {overhead:.1f} ms", file=sys.stderr)

    # the tunnel can also die AFTER the probe, mid-compile or mid-timing —
    # that must be retriable too (VERDICT r2 #5: round 2 lost its number to
    # exactly one such rc=1)
    try:
        return _child_measure(size, frames, iters, overhead)
    except Exception as e:  # noqa: BLE001
        if _is_backend_err(e):
            print(f"# backend died mid-run: {type(e).__name__}: {e}",
                  file=sys.stderr)
            return 42
        raise


def _child_measure(size, frames, iters, overhead) -> int:
    import jax

    # --- primary: BicubicUNet x8 step, DDIM-25 serving config -------------
    make_step, flops_fn = _bicubic_step(size, frames, use_face=False)
    fn, args = make_step("ddim")
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
    print(f"# per_step (ddim update): {per_step*1e3:.0f} ms", file=sys.stderr)
    fps = frames / (per_step * SERVING_STEPS)

    extras = {}

    def _gc():
        # each variant builds its OWN params/args/flows (~1.5 GB of device
        # state); keeping prior variants alive cascaded RESOURCE_EXHAUSTED
        # into later ones once batch-2 started allocating for real —
        # callers None-out their references, this drops the device buffers
        import gc

        gc.collect()

    # DDPM continuity number: same forward program, reference update rule
    try:
        fd, ad = make_step("ddpm")
        float(fd(*ad))
        tddpm = _time_step(fd, ad, max(2, iters // 2), overhead)
        extras["per_step_ms_ddpm"] = round(tddpm * 1e3, 2)
        extras["fps_ddpm100"] = round(frames / (tddpm * 100), 4)
        fd = ad = None
        _gc()
    except Exception as e:  # noqa: BLE001
        if _is_backend_err(e):
            raise
        extras["per_step_ms_ddpm"] = None
        print(f"# ddpm step failed: {type(e).__name__}: {e}", file=sys.stderr)
    fn = args = make_step = None
    _gc()

    fps_face = None
    if not os.environ.get("BENCH_SKIP_FACE"):
        try:
            mf, _ = _bicubic_step(size, frames, use_face=True)
            f2, a2 = mf("ddim")
            t0 = time.time()
            float(f2(*a2))
            print(f"# face compile+warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            tface = _time_step(f2, a2, max(2, iters // 2), overhead)
            extras["per_step_ms_face"] = round(tface * 1e3, 2)
            # demo-equivalent blend: the face prior runs for t ∈ [τ,
            # t_start=steps−1], τ from the pipeline's own schedule
            # arithmetic (scale_tau — same rescale the CLI applies)
            from flair_tpu.pipeline.video import TASK_CONFIGS, scale_tau

            tau = scale_tau(TASK_CONFIGS["x8_bicubic"].tau, SERVING_STEPS)
            nface = (SERVING_STEPS - 1) - tau + 1
            blended = (nface * tface
                       + (SERVING_STEPS - nface) * per_step) / SERVING_STEPS
            fps_face = round(frames / (blended * SERVING_STEPS), 4)
            extras["value_face"] = fps_face
            extras["face_steps_per_window"] = nface
            f2 = a2 = mf = None
            _gc()
        except Exception as e:  # noqa: BLE001
            if _is_backend_err(e):
                raise
            extras["per_step_ms_face"] = None
            print(f"# face step failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if not os.environ.get("BENCH_SKIP_BLUR"):
        try:
            f3, a3, _ = _blur_step(size, frames)
            t0 = time.time()
            float(f3(*a3))
            print(f"# blur compile+warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            tblur = _time_step(f3, a3, max(2, iters // 2), overhead)
            extras["per_step_ms_blur"] = round(tblur * 1e3, 2)
            extras["value_blur_noface"] = round(
                frames / (tblur * SERVING_STEPS), 4)
            f3 = a3 = None
            _gc()
        except Exception as e:  # noqa: BLE001
            if _is_backend_err(e):
                raise
            tblur = None
            extras["per_step_ms_blur"] = None
            print(f"# blur step failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        # demo-equivalent gaussian number: the reference blur demo ALSO
        # applies the face prior in-window (scripts/demo.bash:4,
        # video_sample.py:446-479) — blend it like the bicubic headline
        # (VERDICT r4 #3: value_blur was face-off while the headline is
        # face-on)
        try:
            if tblur is not None and not os.environ.get("BENCH_SKIP_FACE"):
                f4, a4, _ = _blur_step(size, frames, use_face=True)
                t0 = time.time()
                float(f4(*a4))
                print(f"# blur+face compile+warmup: {time.time()-t0:.1f}s",
                      file=sys.stderr)
                tbf = _time_step(f4, a4, max(2, iters // 2), overhead)
                extras["per_step_ms_blur_face"] = round(tbf * 1e3, 2)
                from flair_tpu.pipeline.video import TASK_CONFIGS, scale_tau

                tau_b = scale_tau(TASK_CONFIGS["gaussian"].tau,
                                  SERVING_STEPS)
                nf = (SERVING_STEPS - 1) - tau_b + 1
                blended_b = (nf * tbf + (SERVING_STEPS - nf) * tblur) \
                    / SERVING_STEPS
                extras["value_blur"] = round(
                    frames / (blended_b * SERVING_STEPS), 4)
                f4 = a4 = None
                _gc()
            elif tblur is not None:
                extras["value_blur"] = extras["value_blur_noface"]
        except Exception as e:  # noqa: BLE001
            if _is_backend_err(e):
                raise
            extras["per_step_ms_blur_face"] = None
            extras["value_blur"] = extras.get("value_blur_noface")
            print(f"# blur+face step failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
        # jpeg-task step: same UNet, but the consistency op pays a
        # differentiable JPEG round-trip the gaussian number hides
        # (pseudoSR.py:266-281; VERDICT r4 #3)
        try:
            f5, a5, _ = _blur_step(size, frames, task="jpeg")
            t0 = time.time()
            float(f5(*a5))
            print(f"# jpeg compile+warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            tjpeg = _time_step(f5, a5, 2, overhead)
            extras["per_step_ms_jpeg"] = round(tjpeg * 1e3, 2)
            extras["value_jpeg_noface"] = round(
                frames / (tjpeg * SERVING_STEPS), 4)
            f5 = a5 = None
            _gc()
        except Exception as e:  # noqa: BLE001
            if _is_backend_err(e):
                raise
            extras["per_step_ms_jpeg"] = None
            print(f"# jpeg step failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    nb = int(os.environ.get("BENCH_BATCH", "2"))
    if nb > 1:
        # serving-throughput variant: nb INDEPENDENT windows restored
        # concurrently (clips are independent in production; within one
        # clip windows are sequential through prev_recon). Latency per
        # step grows sub-linearly — per-call fixed costs amortise. Runs
        # LAST: its near-HBM-limit footprint must not poison the others.
        try:
            mb, _ = _bicubic_step(size, frames, use_face=False, batch=nb)
            fb, ab = mb("ddim")
            t0 = time.time()
            float(fb(*ab))
            print(f"# batch{nb} compile+warmup: {time.time()-t0:.1f}s",
                  file=sys.stderr)
            tb = _time_step(fb, ab, max(2, iters // 2), overhead)
            extras[f"per_step_ms_b{nb}"] = round(tb * 1e3, 2)
            extras[f"fps_batch{nb}"] = round(
                nb * frames / (tb * SERVING_STEPS), 4)
        except Exception as e:  # noqa: BLE001
            if _is_backend_err(e):
                raise
            extras[f"per_step_ms_b{nb}"] = None
            print(f"# batch{nb} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    if os.environ.get("BENCH_DCN", "auto") == "auto":
        # plan-B passthrough (VERDICT r3 #7): surface the most recent
        # BENCH_DCN=patch probe's full-step latency (the TPU-exact DCN
        # fallback) on the default record, dated — measuring it inline
        # would add a multi-minute compile to every driver bench run
        try:
            with open(_LAST) as f:
                store = json.load(f)
            want = {**_bench_config(), "dcn": "patch"}
            want.pop("batch", None)  # the probe skips the batch variant
            for rec in store.values():
                cfg = dict(rec.get("config") or {})
                cfg.pop("batch", None)
                if cfg == want and rec.get("per_step_ms"):
                    extras["per_step_ms_patch"] = rec["per_step_ms"]
                    extras["patch_measured_at"] = rec.get("measured_at")
                    break
        except (OSError, ValueError, AttributeError):
            pass

    kind = jax.devices()[0].device_kind
    peak = _PEAKS.get(kind, V5E_PEAK_BF16)
    mfu = (flops / per_step / peak) if flops else None
    ideal_ms = (flops / peak * 1e3) if flops else None

    # A100 class estimate is 0.1 fps at 100 steps; respacing is equally
    # available to the reference, so scale its denominator to the same
    # schedule — schedule choice alone cannot move this ratio
    a100_fps = 0.1 * 100.0 / SERVING_STEPS
    # headline = the demo-equivalent (face prior ON) configuration; only
    # if the face variant failed to measure does the face-off number
    # stand in — and then the unit says so (VERDICT r3 missing #3)
    headline = fps_face if fps_face is not None else round(fps, 4)
    face_note = "face prior on" if fps_face is not None else "face prior OFF"
    result = {
        "metric": "restored_frames_per_sec_per_chip",
        "value": headline,
        "unit": (f"frames/s ({size}px, {SERVING_STEPS}-step guided DDIM "
                 f"window, {frames} frames, {face_note})"),
        "vs_baseline": round(headline / a100_fps, 3),
        "value_noface": round(fps, 4),
        "config": _bench_config(),
        "per_step_ms": round(per_step * 1e3, 2),
        "step_tflops": round(flops / 1e12, 2) if flops else None,
        "mfu": round(mfu, 4) if mfu else None,
        "ideal_step_ms": round(ideal_ms, 1) if ideal_ms else None,
        "floor_step_ms": FORMULATION_FLOOR_MS,
        "vs_floor": round(FORMULATION_FLOOR_MS / (per_step * 1e3), 3),
        "compile_s": round(compile_s, 1),
        "device": kind,
        **extras,
    }
    try:
        store = {}
        if os.path.exists(_LAST):
            with open(_LAST) as f:
                prev = json.load(f)
            # multi-config store {config_key: record}; ignore legacy flat
            if prev and all(isinstance(v, dict) for v in prev.values()):
                store = {k: v for k, v in prev.items()
                         if isinstance(v, dict) and "config" in v}
        store[_config_key()] = {**result, "measured_at": time.strftime(
            "%Y-%m-%dT%H:%M:%S")}
        with open(_LAST, "w") as f:
            json.dump(store, f)
    except (OSError, ValueError):
        pass
    print(json.dumps(result))
    return 0


def main() -> int:
    if os.environ.get("BENCH_CHILD"):
        return _child_main()

    # parent: retry loop around the child (fresh process per attempt — a
    # failed backend init can leave the in-process JAX state poisoned)
    # default sized for an UNATTENDED (driver) invocation: with the probe
    # watchdog each dead-tunnel attempt costs ~5 min, so 1800 s buys a few
    # retries before falling back to the stale record; long resident runs
    # set BENCH_WAIT_S explicitly (tools/measure_r03.sh uses 43200)
    wait_s = float(os.environ.get("BENCH_WAIT_S", "1800"))
    child_timeout = float(os.environ.get("BENCH_CHILD_TIMEOUT", "5400"))
    deadline = time.time() + wait_s
    delay = 60.0
    last_err = None
    attempt = 0
    while True:
        attempt += 1
        print(f"# bench attempt {attempt}", file=sys.stderr)
        env = dict(os.environ, BENCH_CHILD="1")
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE, timeout=child_timeout,
            )
            out = proc.stdout.decode()
            if proc.returncode == 0 and out.strip():
                # forward the child's final JSON line
                print(out.strip().splitlines()[-1])
                return 0
            last_err = f"child rc={proc.returncode}"
            retriable = proc.returncode == 42
        except subprocess.TimeoutExpired:
            last_err = f"child timed out after {child_timeout:.0f}s"
            retriable = True  # tunnel wedge: execution hangs, enum works
            # the kill above terminated a process mid-TPU-op, which is
            # known to wedge this machine's tunnel for a long time
            # (memory/axon-tunnel-wedge) — a short retry would hang and be
            # killed again, compounding the wedge; cool down instead
            delay = max(delay, 1800.0)
        if not retriable or time.time() + delay > deadline:
            break
        print(f"# {last_err}; retrying in {delay:.0f}s "
              f"({deadline - time.time():.0f}s budget left)", file=sys.stderr)
        time.sleep(delay)
        delay = min(delay * 2, 1800.0)

    # out of budget (or non-retriable): emit the last good record, marked
    # stale, so the driver still gets a parseable, honest number — but
    # only one that measured the SAME config as this invocation (a
    # BENCH_DCN=exact probe run must not impersonate the default headline;
    # the store keeps one record per config for exactly this reason)
    if os.path.exists(_LAST):
        try:
            with open(_LAST) as f:
                store = json.load(f)
        except ValueError:
            store = {}
        rec = store.get(_config_key())
        if rec is None and store.get("config") == _bench_config():
            rec = store  # legacy flat record of the same config
        if rec is not None and "metric" in rec:
            rec["stale"] = True
            rec["error"] = last_err
            print(json.dumps(rec))
            return 0
        print(f"# no stale record for config {_config_key()}; not reusing",
              file=sys.stderr)
    print(json.dumps({
        "metric": "restored_frames_per_sec_per_chip",
        "value": None,
        "unit": "frames/s",
        "vs_baseline": None,
        "error": last_err,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
