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
