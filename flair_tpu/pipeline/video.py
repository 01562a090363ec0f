"""Windowed guided restoration of a face-video clip.

Re-design of the demo driver (scripts/video_sample.py:265-497):
- clips are processed in sliding windows of FRAME_SLICE_LEN=10 with
  OVERLAP=3 (video_sample.py:202-203,361-368);
- each window starts from q_sample(init, T-1) where init is the degraded
  input upscaled to 512² (bicubic for x8/x16, area for gaussian/jpeg;
  video_sample.py:372-397);
- cross-window consistency: the previous window's last OVERLAP reconstructed
  frames are pinned into pred_xstart at every sampler step
  (gaussian_diffusion.py:497-506) and dropped at stitch time
  (video_sample.py:480-485).

TPU-first: each window's 100-step restoration is dispatched as TWO jitted
programs per step — the heavy denoiser forward and the cheap guidance
update (sampler="steps", flair_tpu.diffusion.sampler.guided_sample_steps)
— with every per-window tensor (conditioning, flows, degraded frames,
face matrices, pin values) entering as a runtime ARGUMENT so one compiled
pair serves the whole clip. The alternative monolithic scan
(sampler="scan", guided_sample_loop) stays available: it is what the
multi-chip mesh dry-run shards, but at 512² its single XLA program is too
large for this machine's remote compile service (PERF.md). The window loop
is the only host-level loop (inherently sequential through prev_recon).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import (
    Diffusion,
    GuidanceConfig,
    guided_sample_loop,
    guided_sample_steps,
    make_guided_update,
    make_task_diffusion,
    map_timesteps,
    q_sample,
    sr3_noise_level,
)
from ..ops.resize import resize_area, resize_bicubic
from ..operators.factory import get_operator, make_restore_fn, make_restore_fn_p

Array = jax.Array

FRAME_SLICE_LEN = 10
OVERLAP = 3


@dataclasses.dataclass(frozen=True)
class TaskConfig:
    """Per-task demo configuration (scripts/video_sample.py:35-171,499-556)."""

    task: str
    model_name: str          # registry key: bicubic_unet | blur_unet
    input_size: int          # degraded input resolution
    output_size: int = 512
    init_mode: str = "bicubic"  # how the sampler init is upscaled
    steps: str = "100"
    # default guidance hyper-parameters (demo subcommands)
    w: float = 1.0
    rho: float = 0.35
    noise_level: float = 0.0
    zeta: float = -1.0
    tau: int = 5
    t_start: int = -1        # -1 → start from T-1 (video_sample.py:378-397)
    jpeg_qf: int = -1
    # x8/x16 down-weight VSR++ propagation on the parsed background
    # (video_sample.py:427-444): weight = mask_bg·bg_weight + (1−mask_bg)·1
    vsrpp_bg_weight: float = -1.0


TASK_CONFIGS = {
    "x8_bicubic": TaskConfig(
        "x8_bicubic", "bicubic_unet", 64, init_mode="bicubic",
        w=0.85, rho=0.85, noise_level=0.0, vsrpp_bg_weight=0.93,
    ),
    "x16_bicubic": TaskConfig(
        "x16_bicubic", "bicubic_unet", 32, init_mode="bicubic",
        w=0.7, rho=0.85, noise_level=0.0, vsrpp_bg_weight=0.98,
    ),
    "gaussian": TaskConfig(
        "gaussian", "blur_unet", 128, init_mode="area",
        w=0.75, rho=0.25, noise_level=2.55, zeta=1.0,
    ),
    "jpeg": TaskConfig(
        "jpeg", "blur_unet", 128, init_mode="area",
        w=0.5, rho=0.5, noise_level=12.75, zeta=1.0, jpeg_qf=60,
    ),
}


def scale_tau(tau: int, num_timesteps: int) -> int:
    """Rescale a demo tau (stated in 100-respaced-step units,
    video_sample.py:499-556) to a respaced schedule, keeping the same
    FRACTION of the trajectory inside the face-prior window — the one
    place this arithmetic lives (CLI default and bench blend share it)."""
    if num_timesteps == 100:
        return tau
    return max(1, round(tau * num_timesteps / 100))


def window_slices(num_frames: int, win: int = FRAME_SLICE_LEN, overlap: int = OVERLAP):
    """(start, length) of each sliding window — more_itertools.windowed with
    step = win−overlap and a SHORT tail window (None-filtered), exactly as
    the demo driver builds them (video_sample.py:361-368)."""
    step = win - overlap
    out = []
    start = 0
    while True:
        length = min(win, num_frames - start)
        out.append((start, length))
        if start + length >= num_frames:
            break
        start += step
    return out


def init_from_degraded(frames01: Array, cfg: TaskConfig) -> Array:
    """Upscale degraded [0,1] frames to the output size and map to [-1,1]
    (video_sample.py:372-377 INIT_FUNC)."""
    size = (cfg.output_size, cfg.output_size)
    if cfg.init_mode == "bicubic":
        up = jnp.clip(resize_bicubic(frames01, size), 0, 1)
    else:
        up = jnp.clip(resize_area(frames01, size), 0, 1)
    return up * 2.0 - 1.0


def _fill_missing_matrices(mats):
    """Replace None entries (frames with no detected face) by the nearest
    frame's matrix. Returns (T,2,3) array or None if no frame has a face.
    (The reference zips frames against the found-face matrices and would
    mis-pair on a miss, video_sample.py:446-448 — demo clips always detect;
    nearest-neighbour reuse is the graceful generalisation.)"""
    idx = [i for i, m in enumerate(mats) if m is not None]
    if not idx:
        return None
    out = []
    for i in range(len(mats)):
        if mats[i] is not None:
            out.append(mats[i])
        else:
            j = min(idx, key=lambda k: abs(k - i))
            out.append(mats[j])
    return np.stack(out).astype(np.float32)


def restore_video(
    degraded01: np.ndarray,
    cfg: TaskConfig,
    model_apply: Callable,        # (x, t_spaced, extras...) -> raw model out
    *,
    diffusion: Optional[Diffusion] = None,
    face_fn=None,                 # fixed face_fn (overrides face_helper path)
    face_helper=None,             # FaceRestoreHelper: per-window detection
    codeformer_apply=None,        # (N,512,512,3)→restored faces ([-1,1] NHWC)
    parsenet_apply=None,          # (N,512,512,3)→(N,512,512,19) mask logits
    guidance: Optional[GuidanceConfig] = None,
    rng: Optional[Array] = None,
    win: int = FRAME_SLICE_LEN,
    overlap: int = OVERLAP,
    pad_tail: bool = True,
    sampler: str = "steps",
    eta: float = 0.0,
    mesh=None,
    frame_axis: str = "frame",
) -> np.ndarray:
    """Restore a full clip window by window.

    ``degraded01``: (T, h, w, 3) in [0, 1] host array — or (B, T, h, w, 3)
    to restore B independent clips batched through the same compiled
    programs (serving throughput; returns (B, T, H, W, 3)). Each clip's
    windows remain sequential through its own prev_recon chain.
    ``model_apply(x, t, low_res, rnn_input, vsrpp_weights)`` is the wrapped
    denoiser returning the raw model output for spaced step t.

    Face prior (video_sample.py:446-479): when ``face_helper`` and
    ``codeformer_apply`` are given, faces are detected once per window on the
    upscaled init frames, and the per-step crop → CodeFormer(adain) →
    ParseNet-mask paste-back runs on device inside the scanned sampler.
    ``pad_tail``: pad the short tail window to ``win`` frames by repeating
    the last frame (dropped at stitch time), so every window runs the SAME
    compiled program — the reference's short tail window
    (video_sample.py:361-368) costs a second multi-minute XLA compile per
    clip on TPU. Set False for bit-exact reference-window semantics.

    ``sampler``: "steps" (default) dispatches each guided step as two jitted
    programs (model forward + guidance update) with all per-window tensors
    as runtime arguments — compile-robust at 512² and numerically identical
    to "scan", the monolithic lax.scan program of guided_sample_loop.
    "ddim" uses the same two-program dispatch with the standard η-DDIM
    update rule (``eta``; see diffusion.sampler.p_sample) — the fast
    serving path when combined with a respaced diffusion (cfg.steps =
    "ddimN"); all guidance hooks (consistency, face prior, pinning) apply.
    "scan"/"scan_p" are NOT production paths: measured dispatch overhead
    of the host loop is 0.47 ms/step (tools/profile_dispatch.py, PERF.md
    round 3), so the monolithic programs buy nothing — they are kept for
    CPU parity tests and the multi-chip dry-run.

    ``mesh``: multi-chip serving. When a ``jax.sharding.Mesh`` is given,
    every per-window tensor whose frame dim divides the mesh's
    ``frame_axis`` is placed with a frame-sharded NamedSharding before the
    jitted programs run; GSPMD propagates the sharding through the model
    and update programs and inserts the ICI collectives (halo exchanges
    for the temporal stack, psums for norm stats — SURVEY §5.7 mapping).
    The host window loop (prev_recon chain) is unchanged.

    Returns (T, 512, 512, 3) in [0, 1].
    """
    from ..face.helper import make_face_fn, make_face_fn_p

    d = diffusion or make_task_diffusion(cfg.task, cfg.steps)
    rng = jax.random.PRNGKey(0) if rng is None else rng

    operator = get_operator(cfg.task, cfg.output_size)
    # batched multi-clip serving: (B, T, h, w, 3) restores B INDEPENDENT
    # clips through the same compiled programs (per-step fixed costs
    # amortise across the batch; clips are independent in production, so
    # this is the throughput lever on top of DDIM respacing)
    batched = degraded01.ndim == 5
    frames = jnp.asarray(
        degraded01 if batched else degraded01[None], jnp.float32)
    nclips, t_all = frames.shape[0], frames.shape[1]
    is_blur_task = cfg.task in ("gaussian", "jpeg")

    outputs = [None] * t_all  # each (B, H, W, 3)
    prev_recon = None  # (B, overlap, H, W, 3) tail of previous window

    # multi-chip serving: frame-shard the window tensors; GSPMD propagates
    # through the jitted model/update programs and inserts ICI collectives
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        _fsz = dict(zip(mesh.axis_names, mesh.devices.shape))[frame_axis]
        _shard5 = NamedSharding(mesh, PartitionSpec(None, frame_axis))
        _shard4 = NamedSharding(mesh, PartitionSpec(frame_axis))

        def _shard(v, dim=1):
            sh = _shard5 if dim == 1 else _shard4
            if v is not None and v.shape[dim] % _fsz == 0:
                return jax.device_put(v, sh)
            return v
    else:
        def _shard(v, dim=1):
            return v

    # SPyNet flows depend only on rnn_input (fixed per window): jit once,
    # compute once per window, pass into the sampler as a runtime argument
    # (the reference recomputes identical flows inside every denoiser
    # evaluation, unet.py:531-595 / unet_new.py:1283-1348)
    flows_jit = (
        jax.jit(model_apply.flows_fn)
        if hasattr(model_apply, "flows_fn")
        else None
    )

    has_apply_p = hasattr(model_apply, "apply_p")
    rule = "ddim" if sampler == "ddim" else "ddpm"
    use_scan_p = sampler == "scan_p" and has_apply_p
    use_steps = sampler in ("steps", "ddim") or (
        sampler == "scan_p" and not has_apply_p)
    # two-program sampler: one jitted model program (params + all window
    # tensors as arguments) + one jitted guidance-update program per
    # guidance variant, shared across every window of the clip
    jit_apply_p = (
        jax.jit(model_apply.apply_p)
        if use_steps and has_apply_p
        else None
    )
    restore_p = make_restore_fn_p(cfg.task, operator, jpeg_qf=cfg.jpeg_qf)

    def restore_fn_p(x0, degraded):
        flat = x0.reshape((x0.shape[0] * x0.shape[1],) + x0.shape[2:])
        return restore_p(flat, degraded).reshape(x0.shape)

    face_fn_p = None
    face_params_extra = ()
    if face_fn is not None:
        # fixed caller-supplied (x0, x_t) closure: adapt to the args protocol
        face_fn_p = lambda x0, xt, *a: face_fn(x0, xt)
    elif codeformer_apply is not None:
        cf_p = getattr(codeformer_apply, "apply_p", None)
        pn_p = (getattr(parsenet_apply, "apply_p", None)
                if parsenet_apply is not None else None)
        if cf_p is not None and (parsenet_apply is None or pn_p is not None):
            # params-threaded face nets: CodeFormer/ParseNet weights enter
            # the update program as runtime arguments (PERF.md compile wall)
            if pn_p is not None:
                def face_fn_p(x0, xt, mats, cfp, pnp):
                    fn = make_face_fn_p(
                        lambda f: cf_p(cfp, f), lambda f: pn_p(pnp, f),
                        face_size=cfg.output_size,
                    )
                    return fn(x0, xt, mats)

                face_params_extra = (
                    codeformer_apply.params, parsenet_apply.params)
            else:
                def face_fn_p(x0, xt, mats, cfp):
                    fn = make_face_fn_p(
                        lambda f: cf_p(cfp, f), None,
                        face_size=cfg.output_size,
                    )
                    return fn(x0, xt, mats)

                face_params_extra = (codeformer_apply.params,)
        else:
            face_fn_p = make_face_fn_p(
                codeformer_apply, parsenet_apply, face_size=cfg.output_size
            )
    _update_cache: dict = {}

    def get_update(g: GuidanceConfig):
        if g not in _update_cache:
            _update_cache[g] = jax.jit(make_guided_update(
                d, g, restore_fn=restore_fn_p, face_fn=face_fn_p,
                rule=rule, eta=eta))
        return _update_cache[g]

    # scan_p: the ENTIRE window loop as one jitted program, every window
    # tensor a runtime argument (the compile wall is closure CONSTANTS,
    # not program size — PERF.md). Zero per-step dispatch overhead; XLA
    # schedules across the whole 100-step scan.
    _scan_p_cache: dict = {}

    def get_scan_p(g: GuidanceConfig):
        if g not in _scan_p_cache:
            def window_program(params, noise, k_loop, low_res, rnn_input,
                               vsrpp_weights, flows, degraded, face_args,
                               pin_mask, pin_values):
                def model_fn(x, t):
                    return model_apply.apply_p(
                        params, x, t, low_res, rnn_input, vsrpp_weights,
                        flows)

                f_fn = None
                if face_args is not None and face_fn_p is not None:
                    f_fn = lambda x0, xt: face_fn_p(x0, xt, *face_args)
                return guided_sample_loop(
                    d, model_fn, noise, k_loop, g,
                    restore_fn=lambda x0: restore_fn_p(x0, degraded),
                    face_fn=f_fn,
                    pin_mask=pin_mask, pin_values=pin_values,
                    rule=rule, eta=eta,
                )

            _scan_p_cache[g] = jax.jit(window_program)
        return _scan_p_cache[g]

    for wi, (start, length) in enumerate(window_slices(t_all, win, overlap)):
        sl = frames[:, start : start + length]  # (B, Tw, h, w, 3) in [0,1]
        if pad_tail and length < win:
            sl = jnp.concatenate(
                [sl, jnp.repeat(sl[:, -1:], win - length, axis=1)], axis=1
            )
        tw = sl.shape[1]
        init = init_from_degraded(sl, cfg)
        low_res = init  # conditioning = upscaled degraded (video_sample.py:399-403)
        # degraded frames are normalised to [-1,1] BEFORE the restore closure
        # (video_sample.py:373: (d − 0.5)/0.5)
        degraded_pm1 = sl * 2.0 - 1.0

        # SPyNet conditioning: bicubic-upscaled degraded for gaussian/jpeg
        # (video_sample.py:405-425); BlurUNet/BicubicUNet default rnn_input =
        # low_res otherwise (unet_new.py:1332-1333).
        if is_blur_task:
            rnn_input = jnp.clip(
                resize_bicubic(sl, (cfg.output_size, cfg.output_size)) * 2.0 - 1.0,
                -1.0,
                1.0,
            )
        else:
            rnn_input = low_res

        # x8/x16: down-weight VSR++ propagation on the parsed background
        # (video_sample.py:427-444): weight = 1[bg]·0.93/0.98 + 1[face]·1.
        vsrpp_weights = None
        if cfg.vsrpp_bg_weight > 0 and parsenet_apply is not None:
            logits = parsenet_apply(
                init.reshape(nclips * tw, *init.shape[2:]))
            bg = (jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32)[..., None]
            vsrpp_weights = (
                bg * cfg.vsrpp_bg_weight + (1.0 - bg) * 1.0
            ).reshape(nclips, tw, *bg.shape[1:])  # (B, Tw, H, W, 1)

        # face prior: detect once per window on the init frames
        # (video_sample.py:446-448), fuse on device per step.
        window_face_fn = face_fn
        mats = None
        if window_face_fn is None and face_helper is not None and codeformer_apply:
            mats_list = [
                _fill_missing_matrices(
                    face_helper.get_affine_matrices(
                        np.asarray((init[bi] + 1.0) / 2.0),
                        only_keep_largest=True, eye_dist_threshold=0.1,
                    )
                )
                for bi in range(nclips)
            ]
            if all(m is not None for m in mats_list):
                # (B, Tw, 2, 3) per-clip matrices; a window where ANY clip
                # has no detectable face runs without the prior for the
                # whole batch (conservative; single-clip semantics match
                # the reference, video_sample.py:446-448)
                mats = (np.stack(mats_list) if batched else mats_list[0])
                window_face_fn = make_face_fn(
                    mats, codeformer_apply, parsenet_apply,
                    face_size=cfg.output_size,
                )

        g = guidance or GuidanceConfig(
            w=cfg.w,
            rho=cfg.rho,
            noise_level=cfg.noise_level,
            zeta=cfg.zeta,
            tau=cfg.tau,
            t_start=cfg.t_start,
            use_aux=window_face_fn is not None,
        )

        rng, k_init, k_loop = jax.random.split(rng, 3)
        noise = jax.random.normal(k_init, init.shape, init.dtype)
        # init is q_sampled at t_start when set, else T-1 (video_sample.py:378-397)
        t_init = d.num_timesteps - 1 if cfg.t_start == -1 else cfg.t_start
        x_t = q_sample(d, init, jnp.full((1,), t_init, jnp.int32), noise)
        x_t = _shard(x_t)
        low_res = _shard(low_res)
        rnn_input = _shard(rnn_input)
        if vsrpp_weights is not None:
            vsrpp_weights = _shard(vsrpp_weights)

        restore = make_restore_fn(
            cfg.task,
            operator,
            degraded_pm1.reshape(nclips * tw, *sl.shape[2:]),
            jpeg_qf=cfg.jpeg_qf,
        )

        def restore_fn(x0):
            flat = x0.reshape((x0.shape[0] * x0.shape[1],) + x0.shape[2:])
            out = restore(flat)
            return out.reshape(x0.shape)

        pin_mask = None
        pin_values = None
        if prev_recon is not None:
            mask = np.zeros((1, tw, 1, 1, 1), np.float32)
            mask[:, :overlap] = 1.0
            pin_mask = jnp.asarray(mask, bool)
            pin_values = _shard(
                jnp.zeros_like(x_t).at[:, :overlap].set(prev_recon))

        flows = None if flows_jit is None else flows_jit(rnn_input)

        if use_scan_p:
            degraded_dev = _shard(
                degraded_pm1.reshape(nclips * tw, *sl.shape[2:]), dim=0)
            if window_face_fn is None:
                face_args = None
            elif face_fn is not None:
                face_args = ()
            else:
                face_args = (
                    (jnp.asarray(mats, jnp.float32),) + face_params_extra)
            sample = get_scan_p(g)(
                model_apply.params, x_t, k_loop, low_res, rnn_input,
                vsrpp_weights, flows, degraded_dev, face_args,
                pin_mask, pin_values,
            )
        elif use_steps:
            # two-program path: model + update, all window data as args
            degraded_dev = _shard(
                degraded_pm1.reshape(nclips * tw, *sl.shape[2:]), dim=0)
            if window_face_fn is None:
                face_args = None
            elif face_fn is not None:
                face_args = ()  # fixed caller closure, no runtime extras
            else:
                face_args = (
                    (jnp.asarray(mats, jnp.float32),) + face_params_extra)
            if jit_apply_p is not None:
                def model_fn(x, t):
                    return jit_apply_p(
                        model_apply.params, x, t, low_res, rnn_input,
                        vsrpp_weights, flows,
                    )
            elif flows is not None:
                model_fn = jax.jit(lambda x, t: model_apply(
                    x, t, low_res, rnn_input, vsrpp_weights, flows))
            else:
                model_fn = jax.jit(lambda x, t: model_apply(
                    x, t, low_res, rnn_input, vsrpp_weights))
            sample = guided_sample_steps(
                d,
                model_fn,
                x_t,
                k_loop,
                g,
                update=get_update(g),
                pin_mask=pin_mask,
                pin_values=pin_values,
                restore_args=(degraded_dev,),
                face_args=face_args,
            )
        else:
            if flows is not None:
                def model_fn(x, t):
                    return model_apply(
                        x, t, low_res, rnn_input, vsrpp_weights, flows
                    )
            else:
                def model_fn(x, t):
                    return model_apply(x, t, low_res, rnn_input, vsrpp_weights)

            sample = guided_sample_loop(
                d,
                model_fn,
                x_t,
                k_loop,
                g,
                restore_fn=restore_fn,
                face_fn=window_face_fn,
                pin_mask=pin_mask,
                pin_values=pin_values,
                rule=rule,
                eta=eta,
            )
        sample.block_until_ready()

        keep_from = overlap if prev_recon is not None else 0
        recon = np.asarray(sample)  # (B, Tw, H, W, 3)
        for i in range(keep_from, length):
            outputs[start + i] = recon[:, i]
        prev_recon = jnp.asarray(sample[:, length - overlap : length])

    out = np.stack(outputs, axis=1)  # (B, T, H, W, 3) in [-1, 1]
    out = np.clip((out + 1.0) / 2.0, 0.0, 1.0)
    return out if batched else out[0]
