"""Golden-value tests for the diffusion math core against an independent
float64 numpy port of the reference equations
(guided_diffusion/gaussian_diffusion.py, respace.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from flair_tpu.diffusion import (
    Diffusion,
    GuidanceConfig,
    LossType,
    ModelMeanType,
    ModelVarType,
    compute_gammas,
    compute_tables,
    compute_ws,
    get_named_beta_schedule,
    guidance_tables,
    guided_sample_loop,
    make_diffusion,
    make_task_diffusion,
    map_timesteps,
    p_mean_variance,
    p_sample,
    predict_eps_from_xstart,
    predict_xstart_from_eps,
    q_sample,
    respace_betas,
    space_timesteps,
    sr3_noise_level,
    training_losses,
)


def test_named_schedules():
    b = get_named_beta_schedule("face_blur", 1000)
    assert b.shape == (1000,) and b.dtype == np.float64
    np.testing.assert_allclose(b[0], 0.0001)
    np.testing.assert_allclose(b[-1], 0.02)
    b2 = get_named_beta_schedule("face_bicubic", 2000)
    assert b2.shape == (2000,)
    np.testing.assert_allclose(b2[0], 1e-6)
    np.testing.assert_allclose(b2[-1], 1e-2)


def test_tables_identities():
    betas = get_named_beta_schedule("face_blur", 1000)
    t = compute_tables(betas)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    np.testing.assert_allclose(t.alphas_cumprod, acp)
    np.testing.assert_allclose(t.sqrt_alphas_cumprod_prev, np.sqrt(np.append(1.0, acp)))
    np.testing.assert_allclose(
        t.sqrt_one_minus_alphas_cumprod_prev, np.append(0.0, np.sqrt(1 - acp[:-1]))
    )
    pv = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(t.posterior_variance, pv)
    np.testing.assert_allclose(
        t.posterior_log_variance_clipped, np.log(np.append(pv[1], pv[1:]))
    )
    np.testing.assert_allclose(
        t.posterior_mean_coef1, betas * np.sqrt(acp_prev) / (1 - acp)
    )
    np.testing.assert_allclose(
        t.posterior_mean_coef2, (1 - acp_prev) * np.sqrt(alphas) / (1 - acp)
    )


def test_space_timesteps_uniform_100_of_1000():
    steps = space_timesteps(1000, "100", "uniform")
    assert len(steps) == 100
    assert 0 in steps and 999 in steps  # frac_stride covers endpoints
    new_betas, tmap = respace_betas(get_named_beta_schedule("face_blur", 1000), steps)
    assert new_betas.shape == (100,) and tmap.shape == (100,)
    # respaced alphas_cumprod must equal the base table at the kept indices
    base = compute_tables(get_named_beta_schedule("face_blur", 1000))
    spaced = compute_tables(new_betas)
    np.testing.assert_allclose(
        spaced.alphas_cumprod, base.alphas_cumprod[tmap], rtol=1e-12
    )


def test_space_timesteps_ddim_and_quad():
    s = space_timesteps(1000, "ddim25", "uniform")
    assert len(s) == 25
    q = space_timesteps(1000, "25", "quad")
    assert len(q) == 25 and q[0] == 0


def test_q_sample_matches_numpy():
    d = make_diffusion(get_named_beta_schedule("face_blur", 1000))
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    noise = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    t = np.array([10, 500])
    got = q_sample(d, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    tab = compute_tables(get_named_beta_schedule("face_blur", 1000))
    want = (
        tab.sqrt_alphas_cumprod[t][:, None, None, None] * x0
        + tab.sqrt_one_minus_alphas_cumprod[t][:, None, None, None] * noise
    )
    np.testing.assert_allclose(np.asarray(got), want.astype(np.float32), rtol=2e-5, atol=2e-5)


def test_eps_xstart_roundtrip():
    d = make_diffusion(get_named_beta_schedule("face_blur", 1000))
    rng = np.random.default_rng(1)
    x_t = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    eps = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    t = jnp.asarray([3, 700])
    x0 = predict_xstart_from_eps(d, x_t, t, eps)
    eps2 = predict_eps_from_xstart(d, x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), rtol=2e-3, atol=2e-3)


def test_p_mean_variance_fixed_small_epsilon():
    betas = get_named_beta_schedule("face_blur", 1000)
    d = make_diffusion(betas)
    tab = compute_tables(betas)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    eps = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    t = np.array([100, 900])
    out = p_mean_variance(d, jnp.asarray(eps), jnp.asarray(x), jnp.asarray(t))
    # numpy golden
    x0 = (
        tab.sqrt_recip_alphas_cumprod[t][:, None, None, None] * x
        - tab.sqrt_recipm1_alphas_cumprod[t][:, None, None, None] * eps
    )
    x0 = np.clip(x0, -1, 1)
    mean = (
        tab.posterior_mean_coef1[t][:, None, None, None] * x0
        + tab.posterior_mean_coef2[t][:, None, None, None] * x
    )
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), x0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["mean"]), mean, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out["variance"])[:, 0, 0, 0],
        tab.posterior_variance[t],
        rtol=1e-5,
    )


def test_p_mean_variance_learned_range_split():
    betas = get_named_beta_schedule("face_blur", 1000)
    d = make_diffusion(betas, model_var_type=ModelVarType.LEARNED_RANGE)
    tab = compute_tables(betas)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    model_out = rng.standard_normal((1, 4, 4, 6)).astype(np.float32)
    t = np.array([500])
    out = p_mean_variance(d, jnp.asarray(model_out), jnp.asarray(x), jnp.asarray(t))
    v = model_out[..., 3:]
    frac = (v + 1) / 2
    min_log = tab.posterior_log_variance_clipped[t][:, None, None, None]
    max_log = np.log(tab.betas)[t][:, None, None, None]
    want_logvar = frac * max_log + (1 - frac) * min_log
    np.testing.assert_allclose(
        np.asarray(out["log_variance"]), want_logvar, rtol=1e-4, atol=1e-4
    )


def test_sr3_noise_level_and_timestep_map():
    d = make_task_diffusion("x8_bicubic", "100")
    assert d.num_timesteps == 100
    assert d.original_num_steps == 2000
    t = jnp.asarray([0, 50, 99])
    nl = sr3_noise_level(d, t)
    tab_spaced = compute_tables(
        respace_betas(
            get_named_beta_schedule("face_bicubic", 2000),
            space_timesteps(2000, "100"),
        )[0]
    )
    np.testing.assert_allclose(
        np.asarray(nl), tab_spaced.sqrt_alphas_cumprod_prev[[1, 51, 100]], rtol=1e-6
    )
    mapped = map_timesteps(d, t)
    assert int(mapped[0]) == 0 and int(mapped[-1]) == 1999


def test_ws_schedule_boundaries():
    T, w, tau, start = 100, 0.75, 5, 99
    ws = compute_ws(T, w, tau, start, use_aux=True)
    assert ws.shape == (T,)
    np.testing.assert_allclose(ws[tau], w, rtol=1e-12)
    np.testing.assert_allclose(ws[start], 1.0, rtol=1e-12)
    np.testing.assert_allclose(ws[:tau], 1.0)
    assert np.all(np.diff(ws[tau : start + 1]) >= -1e-12)  # monotone ramp up
    # no-aux → all ones
    np.testing.assert_allclose(compute_ws(T, w, tau, start, use_aux=False), 1.0)
    # degenerate window → constant w
    np.testing.assert_allclose(compute_ws(T, w, 10, 10, use_aux=True), w)


def test_gammas_schedule():
    betas = get_named_beta_schedule("face_blur", 1000)
    tab = compute_tables(betas)
    g = compute_gammas(
        betas, tab.sqrt_alphas_cumprod, tab.sqrt_one_minus_alphas_cumprod, 1.0, 2.55
    )
    raw = 1.0 * (2.55**2 / (tab.sqrt_one_minus_alphas_cumprod / tab.sqrt_alphas_cumprod) ** 2)
    want = raw.copy()
    want[want >= 1] = 0.991
    want[want <= 1e-1] = 1e-6
    want = 1 - want
    np.testing.assert_allclose(g, want, rtol=1e-12)
    # zeta=-1 disables
    np.testing.assert_allclose(
        compute_gammas(betas, tab.sqrt_alphas_cumprod, tab.sqrt_one_minus_alphas_cumprod, -1, 0.0),
        1.0,
    )


def test_p_sample_update_formula():
    """Check the FLAIR update x_{t-1} = √ᾱ_{t-1}·x0 + 1[t≠0]·√(1−ᾱ_{t-1})·
    (√(1−ρ)ε̂ + √ρ z) against numpy (gaussian_diffusion.py:507-515)."""
    betas = get_named_beta_schedule("face_blur", 1000)
    d = make_diffusion(betas)
    tab = compute_tables(betas)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    eps_pred = rng.standard_normal((1, 4, 4, 3)).astype(np.float32) * 0.1
    z = rng.standard_normal((1, 4, 4, 3)).astype(np.float32)
    rho = 0.25
    ti = 800
    sample, x0 = p_sample(
        d,
        jnp.asarray(eps_pred),
        jnp.asarray(x),
        jnp.asarray(ti),
        jnp.asarray(z),
        w_t=jnp.asarray(1.0),
        gamma_t=jnp.asarray(1.0),
        rho=rho,
        in_face_window=jnp.asarray(False),
        clip_denoised=True,
    )
    x0_np = np.clip(
        tab.sqrt_recip_alphas_cumprod[ti] * x - tab.sqrt_recipm1_alphas_cumprod[ti] * eps_pred,
        -1,
        1,
    )
    eps_np = (
        tab.sqrt_recip_alphas_cumprod[ti] * x - x0_np
    ) / tab.sqrt_recipm1_alphas_cumprod[ti]
    co = tab.sqrt_one_minus_alphas_cumprod_prev[ti]
    want = tab.sqrt_alphas_cumprod_prev[ti] * x0_np + (
        np.sqrt(1 - rho) * co * eps_np + np.sqrt(rho) * co * z
    )
    np.testing.assert_allclose(np.asarray(sample), want, rtol=2e-3, atol=2e-3)
    # t=0: pure x0 rescale, no noise
    sample0, _ = p_sample(
        d,
        jnp.asarray(eps_pred),
        jnp.asarray(x),
        jnp.asarray(0),
        jnp.asarray(z),
        w_t=jnp.asarray(1.0),
        gamma_t=jnp.asarray(1.0),
        rho=rho,
        in_face_window=jnp.asarray(False),
    )
    x0_np0 = np.clip(
        tab.sqrt_recip_alphas_cumprod[0] * x - tab.sqrt_recipm1_alphas_cumprod[0] * eps_pred,
        -1,
        1,
    )
    np.testing.assert_allclose(
        np.asarray(sample0), tab.sqrt_alphas_cumprod_prev[0] * x0_np0, rtol=1e-4, atol=1e-4
    )


def test_guided_sample_loop_with_stub_model():
    """Analytic ε (zero) denoiser: the loop must contract toward clip(x/σ...)
    and run fully jitted."""
    d = make_task_diffusion("gaussian", "10")
    assert d.num_timesteps == 10

    def model_fn(x, t):
        # LEARNED_RANGE: 6 channels out (eps=0, var=-1 → min variance)
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=-1)

    noise = jnp.ones((1, 8, 8, 3), jnp.float32) * 0.5
    cfg = GuidanceConfig(w=0.75, tau=5, rho=0.25, zeta=-1.0, use_aux=False)
    out = jax.jit(
        lambda n, r: guided_sample_loop(d, model_fn, n, r, cfg)
    )(noise, jax.random.PRNGKey(0))
    assert out.shape == noise.shape
    assert np.isfinite(np.asarray(out)).all()


def test_guided_sample_restore_and_pin():
    d = make_task_diffusion("x8_bicubic", "10")

    def model_fn(x, t):
        return jnp.zeros_like(x)  # FIXED_SMALL: 3 channels

    target = jnp.ones((1, 2, 4, 4, 3), jnp.float32) * 0.25  # (B,T,H,W,C)

    def restore_fn(x0):
        return x0 - target  # gradient of ||x0 - target||²/2 → pulls x0 to target

    pin_values = jnp.full_like(target, 0.9)
    pin_mask = jnp.zeros_like(target).at[:, :1].set(1.0) > 0
    noise = jnp.zeros_like(target)
    cfg = GuidanceConfig(w=1.0, tau=0, rho=0.0, zeta=-1.0, use_aux=False)
    out = guided_sample_loop(
        d,
        model_fn,
        noise,
        jax.random.PRNGKey(1),
        cfg,
        restore_fn=restore_fn,
        pin_mask=pin_mask,
        pin_values=pin_values,
    )
    out = np.asarray(out)
    # gamma=1 → x0 = x0 - (x0 - target) = target exactly each step
    np.testing.assert_allclose(out[:, 1], 0.25, atol=1e-5)
    # pinned frames follow pin_values through the final step
    np.testing.assert_allclose(out[:, 0], 0.9, atol=1e-5)


def test_training_losses_mse_and_vb():
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (4, 8, 8, 3))
    t = jnp.asarray([0, 10, 50, 99])

    d = make_task_diffusion("x8_bicubic", "100")  # MSE / FIXED_SMALL
    terms = training_losses(d, lambda x, tt: jnp.zeros_like(x), x0, t, rng)
    assert terms["loss"].shape == (4,)
    assert np.isfinite(np.asarray(terms["loss"])).all()

    d2 = make_task_diffusion("gaussian", "100")  # RESCALED_MSE / LEARNED_RANGE
    model = lambda x, tt: jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], -1)
    terms2 = training_losses(d2, model, x0, t, rng)
    assert "vb" in terms2 and np.isfinite(np.asarray(terms2["loss"])).all()


def test_loss_aware_resampler():
    from flair_tpu.diffusion import (
        LossAwareState,
        loss_aware_sample,
        loss_aware_weights,
        update_with_losses,
    )

    state = LossAwareState.create(10, history_per_term=2)
    w = loss_aware_weights(state)
    np.testing.assert_allclose(np.asarray(w), 0.1)  # uniform until warmed
    ts = jnp.asarray([0] * 2 + [1] * 2 + [2] * 2 + [3] * 2 + [4] * 2)
    losses = jnp.ones((10,))
    state = update_with_losses(state, ts, losses)
    ts2 = jnp.asarray([5] * 2 + [6] * 2 + [7] * 2 + [8] * 2 + [9] * 2)
    state = update_with_losses(state, ts2, losses * 3.0)
    w2 = np.asarray(loss_aware_weights(state))
    assert w2[9] > w2[0]  # higher loss → higher probability
    t, wts = loss_aware_sample(jax.random.PRNGKey(0), state, 16)
    assert t.shape == (16,) and np.isfinite(np.asarray(wts)).all()


def test_guided_sample_steps_matches_scan_loop():
    """The two-program python-loop sampler must reproduce the scanned
    guided_sample_loop BIT-FOR-BIT: same RNG splits, same update math,
    restore + pin + face all exercised (sampler.py make_guided_update)."""
    from flair_tpu.diffusion import guided_sample_steps, make_guided_update

    d = make_task_diffusion("x8_bicubic", "10")

    def model_fn(x, t):
        return 0.03 * x * (1.0 + t.astype(jnp.float32) / 10.0)

    target = jnp.ones((1, 2, 4, 4, 3), jnp.float32) * 0.25

    def restore_fn(x0):
        return 0.3 * (x0 - target)

    def face_fn(x0, x_t):
        return jnp.clip(x0 * 0.5 + 0.1, -1, 1)

    pin_values = jnp.full_like(target, 0.9)
    pin_mask = jnp.zeros_like(target).at[:, :1].set(1.0) > 0
    noise = jnp.full_like(target, 0.4)
    cfg = GuidanceConfig(w=0.7, tau=2, rho=0.3, zeta=-1.0, use_aux=True)
    kw = dict(restore_fn=restore_fn, face_fn=face_fn,
              pin_mask=pin_mask, pin_values=pin_values)
    ref = guided_sample_loop(
        d, model_fn, noise, jax.random.PRNGKey(7), cfg, **kw)
    got = guided_sample_steps(
        d, model_fn, noise, jax.random.PRNGKey(7), cfg, **kw)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))

    # the pipeline's shared-update protocol: per-window data as args
    upd = jax.jit(make_guided_update(
        d, cfg,
        restore_fn=lambda x0, tgt: 0.3 * (x0 - tgt),
        face_fn=lambda x0, xt, b: jnp.clip(x0 * 0.5 + b, -1, 1),
    ))
    got2 = guided_sample_steps(
        d, model_fn, noise, jax.random.PRNGKey(7), cfg,
        update=upd, pin_mask=pin_mask, pin_values=pin_values,
        restore_args=(target,), face_args=(jnp.asarray(0.1),))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got2))

    # face disabled per-window via face_args=None
    ref_nf = guided_sample_loop(
        d, model_fn, noise, jax.random.PRNGKey(7), cfg,
        restore_fn=restore_fn, pin_mask=pin_mask, pin_values=pin_values)
    got_nf = guided_sample_steps(
        d, model_fn, noise, jax.random.PRNGKey(7), cfg,
        update=upd, pin_mask=pin_mask, pin_values=pin_values,
        restore_args=(target,), face_args=None)
    np.testing.assert_array_equal(np.asarray(ref_nf), np.asarray(got_nf))
