"""Host run_loop: save → resume → quartile logging → AMT skip-frame interp
(train_util.py:183-334 capability; SURVEY.md §5.4)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_setup():
    from flair_tpu.diffusion import make_diffusion
    from flair_tpu.diffusion.schedules import get_named_beta_schedule
    from flair_tpu.models.sr3 import BicubicUNet
    from flair_tpu.train import TrainConfig

    model = BicubicUNet(
        inner_channel=8, norm_groups=4, channel_mults=(1, 2), attn_res=(),
        vsrpp_res=(), image_size=8, res_blocks=1, num_frames=3, head_dim=4,
        temporal_attn=False, cross_frame_module=False,
    )
    d = make_diffusion(get_named_beta_schedule("face_bicubic", 20))
    b, t, s = 2, 2, 8
    x = jnp.zeros((b, t, s, s, 3), jnp.float32)
    lvl = jnp.full((b, t), 0.5, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, lvl, x)

    def apply_fn(p, x_t, ts, batch):
        from flair_tpu.diffusion import sr3_noise_level

        lv = sr3_noise_level(d, ts.reshape(-1)).reshape(ts.shape)
        return model.apply(p, x_t, lv, batch["low_res_input"])

    cfg = TrainConfig(lr=1e-3, ema_rates=(0.99,))
    return d, apply_fn, cfg, params, (b, t, s)


def _data(b, t, s):
    rs = np.random.RandomState(0)
    while True:
        yield {
            "x_start": rs.rand(b, t, s, s, 3).astype(np.float32) * 2 - 1,
            "low_res_input": rs.rand(b, t, s, s, 3).astype(np.float32) * 2 - 1,
        }


def test_run_loop_saves_resumes_and_logs_quartiles(tmp_path, monkeypatch):
    from flair_tpu.train import TrainRunner
    from flair_tpu.utils import logging as logger

    d, apply_fn, cfg, params, (b, t, s) = _tiny_setup()
    ckpt = str(tmp_path / "ckpts")

    logger.configure(str(tmp_path / "logs"), format_strs=["json"])
    runner = TrainRunner(
        d, apply_fn, cfg, params, ckpt_dir=ckpt,
        log_interval=100, save_interval=2,
    )
    monkeypatch.setenv("DIFFUSION_TRAINING_TEST", "1")
    runner.run_loop(_data(b, t, s), max_steps=10)
    # CI escape hatch: returned right after the first save (step 2)
    assert runner.step == 2
    assert os.path.isdir(os.path.join(ckpt, "state_000002"))

    # quartile keys were logged
    kvs = logger.get_current().name2val
    assert any(k.startswith("loss_q") for k in kvs), sorted(kvs)

    # resume: new runner picks up step 2 and continues
    runner2 = TrainRunner(
        d, apply_fn, cfg, params, ckpt_dir=ckpt,
        log_interval=100, save_interval=100,
    )
    assert runner2.resume_step == 2
    np.testing.assert_allclose(
        np.asarray(runner2.state.step), np.asarray(runner.state.step)
    )
    monkeypatch.delenv("DIFFUSION_TRAINING_TEST")
    runner2.run_loop(_data(b, t, s), max_steps=2)
    assert int(runner2.state.step) == 4


@pytest.mark.slow
def test_interpolate_skipped_frames_shape():
    """AMT densification: N frames with skip=2 → 2N-1 frames, originals kept
    in place (train_util.py:231-250 roundrobin)."""
    from flair_tpu.models.amt import AMT
    from flair_tpu.train import interpolate_skipped_frames

    model = AMT(channels=(16, 24, 32, 48), skip_channels=16, num_flows=2,
                corr_radius=2, corr_lvls=2)
    b, n, s = 1, 3, 32
    rs = np.random.RandomState(0)
    low = jnp.asarray(rs.rand(b, n, s, s, 3) * 2 - 1, jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)), jnp.zeros((1,)),
    )
    out = interpolate_skipped_frames(model, params, low, skip=2)
    assert out.shape == (b, 2 * n - 1, s, s, 3)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(low[:, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(low[:, 1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[:, 4]), np.asarray(low[:, 2]), atol=1e-6)
