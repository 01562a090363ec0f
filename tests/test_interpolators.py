"""Frame-interpolator tests: SuperSloMo and AMT (tiny shapes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_superslomo_forward():
    from flair_tpu.models.superslomo import SuperSloMo

    model = SuperSloMo(factor=3)
    f0 = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 2 - 1,
                     jnp.float32)
    f1 = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3) * 2 - 1,
                     jnp.float32)
    params = model.init(jax.random.PRNGKey(0), f0, f1)
    out = model.apply(params, f0, f1)
    assert out.shape == (1, 2, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_amt_bidir_corr_matches_naive():
    from flair_tpu.models.amt import BidirCorr

    rs = np.random.RandomState(2)
    b, h, w, d = 1, 4, 4, 8
    f0 = jnp.asarray(rs.randn(b, h, w, d), jnp.float32)
    f1 = jnp.asarray(rs.randn(b, h, w, d), jnp.float32)
    corr_fn = BidirCorr(f0, f1, num_levels=1, radius=1)
    gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = jnp.asarray(
        np.stack([gx, gy], -1)[None].astype(np.float32)
    )
    c0, c1 = corr_fn.lookup(coords, coords)
    # centre tap of the 3x3 window equals the all-pairs diag correlation
    naive = np.einsum("bhwd,bhwd->bhw", np.asarray(f0), np.asarray(f1)) / np.sqrt(d)
    centre = np.asarray(c0)[..., 4]  # (2r+1)²=9, centre index 4
    np.testing.assert_allclose(centre, naive, atol=1e-4)
    centre_t = np.asarray(c1)[..., 4]
    np.testing.assert_allclose(centre_t, naive, atol=1e-4)


@pytest.mark.slow
def test_amt_forward_and_interpolate():
    from flair_tpu.models.amt import AMT, interpolate

    model = AMT(channels=(16, 24, 32, 48), skip_channels=16, num_flows=2,
                corr_lvls=2, corr_radius=2)
    f0 = jnp.asarray(np.random.RandomState(3).rand(1, 32, 32, 3), jnp.float32)
    f1 = jnp.asarray(np.random.RandomState(4).rand(1, 32, 32, 3), jnp.float32)
    embt = jnp.asarray([0.5], jnp.float32)
    params = model.init(jax.random.PRNGKey(0), f0, f1, embt)
    out = model.apply(params, f0, f1, embt)
    assert out.shape == (1, 32, 32, 3)
    interp = interpolate(model, params, f0 * 2 - 1, f1 * 2 - 1, factor=2)
    assert interp.shape == (1, 1, 32, 32, 3)
    assert np.isfinite(np.asarray(interp)).all()
