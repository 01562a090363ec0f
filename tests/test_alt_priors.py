"""Alternative face priors: VQFR and RestoreFormer (tiny configs)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_vqfr_forward():
    from flair_tpu.models.vqfr import VQFRv2

    model = VQFRv2(
        base_channels=32,
        channel_multipliers=(1, 2),
        num_enc_blocks=1,
        num_dec_blocks=1,
        code_dim=32,
        inpfeat_dim=8,
        num_code=16,
        deformable_groups=2,
        code_selection_mode="Predict",
    )
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["main_dec"].shape == (1, 32, 32, 3)
    assert out["texture_dec"].shape == (1, 32, 32, 3)
    assert out["quant_logit"].shape[-1] == 16
    assert np.isfinite(np.asarray(out["main_dec"])).all()


def test_vqfr_nearest_mode():
    from flair_tpu.models.vqfr import VQFRv2

    model = VQFRv2(
        base_channels=32, channel_multipliers=(1, 2), num_enc_blocks=1,
        num_dec_blocks=1, code_dim=32, inpfeat_dim=8, num_code=16,
        deformable_groups=2, code_selection_mode="Nearest",
    )
    x = jnp.asarray(np.random.RandomState(1).rand(1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert "quant_logit" not in out


def test_restoreformer_forward():
    from flair_tpu.models.restoreformer import RestoreFormer

    model = RestoreFormer(
        n_embed=16, embed_dim=16, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(16,), z_channels=16,
        head_size=2, ex_multi_scale_num=1,
    )
    x = jnp.asarray(np.random.RandomState(2).rand(1, 32, 32, 3) * 2 - 1,
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    dec, loss, info, hs = model.apply(params, x)
    assert dec.shape == (1, 32, 32, 3)
    assert np.isfinite(float(loss))
    assert "mid_atten" in hs


def test_vqvaegan_plain_variant_forward():
    """Base VQVAEGAN + plain MultiHeadDecoder (restoreformer.py:415-541,
    678-762) build and forward at a reduced scale."""
    import jax
    import jax.numpy as jnp

    from flair_tpu.models.restoreformer import VQVAEGAN

    m = VQVAEGAN(n_embed=32, embed_dim=16, ch=32, ch_mult=(1, 2),
                 num_res_blocks=1, attn_resolutions=(8,), z_channels=16)
    x = jnp.zeros((1, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    dec, loss, info = m.apply(p, x)
    assert dec.shape == (1, 16, 16, 3)
    assert jnp.isfinite(loss)
