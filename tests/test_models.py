"""Model construction + forward smoke tests (tiny shapes, CPU).

Zero-init invariants at initialisation (the reference zero-inits every
temporal/attention output projection so temporal modules start as identity:
unet.py:667 conv_last, unet.py:758 proj, unet_new.py:1220 out conv):
- BasicVSRPP(hidden, ...) == hidden
- TemporalAttention(x) == x
- enabling/disabling cross-frame modules changes nothing at init.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def rand(*shape, seed=0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape).astype(np.float32))


def test_spynet_shapes():
    from flair_tpu.models.spynet import SPyNet

    net = SPyNet()
    ref = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    supp = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), ref, supp)
    flow = net.apply(params, ref, supp)
    assert flow.shape == (2, 32, 32, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_basicvsrpp_identity_at_init():
    from flair_tpu.models.vsrpp import BasicVSRPP

    b, t, h, w, c = 1, 4, 8, 8, 32
    hidden = rand(b, t, h, w, c, seed=2)
    fwd = rand(b, t - 1, h, w, 2, seed=3) * 0.5
    bwd = rand(b, t - 1, h, w, 2, seed=4) * 0.5
    mod = BasicVSRPP(features=c)
    params = mod.init(jax.random.PRNGKey(0), hidden, fwd, bwd)
    out = mod.apply(params, hidden, fwd, bwd)
    np.testing.assert_allclose(np.asarray(out), np.asarray(hidden), atol=1e-5)


def test_basicvsrpp_bf16_trunk_f32_weight_maps():
    """The x8/x16 serving combination: bf16 trunk + f32 ParseNet-derived
    spatial gating maps (pipeline/video.py:383-390). The gating multiply
    must run in the trunk dtype (reference fp16 autocast, unet.py:489) —
    an unconverted f32 map used to promote the scan carry and crash
    lax.scan with a carry-dtype mismatch (found round 4)."""
    from flair_tpu.models.vsrpp import BasicVSRPP

    b, t, h, w, c = 1, 4, 8, 8, 32
    hidden = rand(b, t, h, w, c, seed=2).astype(jnp.bfloat16)
    fwd = rand(b, t - 1, h, w, 2, seed=3) * 0.5
    bwd = rand(b, t - 1, h, w, 2, seed=4) * 0.5
    # image-res (16x16) f32 map exercises the resize path too
    wmap = (rand(b, t, 2 * h, 2 * w, 1, seed=5) > 0.5).astype(jnp.float32)
    mod = BasicVSRPP(features=c, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), hidden, fwd, bwd, wmap)
    out = mod.apply(params, hidden, fwd, bwd, wmap)
    assert out.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_temporal_attention_identity_at_init_and_grads_flow():
    from flair_tpu.models.temporal import TemporalAttention

    x = rand(1, 5, 4, 4, 32, seed=5)
    mod = TemporalAttention(channels=32, num_frames=5, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_bicubic_unet_forward():
    from flair_tpu.models.sr3 import BicubicUNet

    model = BicubicUNet(
        inner_channel=32,
        norm_groups=16,
        channel_mults=(1, 2),
        attn_res=(16,),
        vsrpp_res=(32,),
        image_size=32,
        res_blocks=1,
        num_frames=7,
        head_dim=8,
        temporal_attn=True,
        cross_frame_module=True,
    )
    b, t = 1, 3
    x = rand(b, t, 32, 32, 3, seed=7)
    lr = rand(b, t, 32, 32, 3, seed=8) * 0.1
    lvl = jnp.full((b, t), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, lvl, lr)
    out = model.apply(params, x, lvl, lr)
    assert out.shape == (b, t, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # at init, temporal modules are identity → cross-frames on/off agree
    out_off = model.apply(params, x, lvl, lr, enable_cross_frames=False)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_off), atol=1e-4
    )


def test_blur_unet_forward():
    from flair_tpu.models.adm import BlurUNet

    model = BlurUNet(
        image_size=32,
        in_channels=6,
        model_channels=64,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions=(2,),
        rnn_resolutions=(1,),
        channel_mult=(0.5, 1),
        num_head_channels=32,
        temporal_frames=5,
    )
    b, t = 1, 3
    x = rand(b, t, 32, 32, 3, seed=9)
    lr = rand(b, t, 32, 32, 3, seed=10) * 0.1
    ts = jnp.array([[5, 5, 5]], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, ts, lr)
    out = model.apply(params, x, ts, lr)
    assert out.shape == (b, t, 32, 32, 6)
    assert np.isfinite(np.asarray(out)).all()
    out_off = model.apply(params, x, ts, lr, enable_cross_frames=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_off), atol=1e-4)


def _perturb(params, scale=0.05, seed=3):
    """Break the zero-init identity so flows actually influence the output."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    leaves = [
        l + jnp.asarray(rs.randn(*l.shape).astype(np.float32)) * scale
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_hoisted_flows_match_inline_bicubic():
    """flows= (precomputed once per window) must equal the inline SPyNet
    path bit-for-bit: the sampler hoists them out of its 100-step scan."""
    from flair_tpu.models.sr3 import BicubicUNet

    model = BicubicUNet(
        inner_channel=32,
        norm_groups=16,
        channel_mults=(1, 2),
        attn_res=(16,),
        vsrpp_res=(32,),
        image_size=32,
        res_blocks=1,
        num_frames=7,
        head_dim=8,
    )
    b, t = 1, 3
    x = rand(b, t, 32, 32, 3, seed=7)
    lr = rand(b, t, 32, 32, 3, seed=8) * 0.1
    lvl = jnp.full((b, t), 0.5)
    params = _perturb(model.init(jax.random.PRNGKey(0), x, lvl, lr))
    out_inline = model.apply(params, x, lvl, lr)
    flows = model.apply(
        params, lr, jnp.zeros((b, t)), lr, rnn_input=lr,
        compute_flows_only=True,
    )
    assert set(flows) == {32}
    out_hoisted = model.apply(params, x, lvl, lr, flows=flows)
    np.testing.assert_array_equal(np.asarray(out_inline), np.asarray(out_hoisted))


def test_hoisted_flows_match_inline_blur():
    from flair_tpu.models.adm import BlurUNet

    model = BlurUNet(
        image_size=32,
        in_channels=6,
        model_channels=64,
        out_channels=6,
        num_res_blocks=1,
        attention_resolutions=(2,),
        rnn_resolutions=(1,),
        channel_mult=(0.5, 1),
        num_head_channels=32,
        temporal_frames=5,
    )
    b, t = 1, 3
    x = rand(b, t, 32, 32, 3, seed=9)
    lr = rand(b, t, 32, 32, 3, seed=10) * 0.1
    ts = jnp.array([[5, 5, 5]], jnp.int32)
    params = _perturb(model.init(jax.random.PRNGKey(0), x, ts, lr))
    out_inline = model.apply(params, x, ts, lr)
    flows = model.apply(
        params, lr, jnp.zeros((b, t), jnp.int32), lr, rnn_input=lr,
        compute_flows_only=True,
    )
    assert set(flows) == {32}
    out_hoisted = model.apply(params, x, ts, lr, flows=flows)
    np.testing.assert_array_equal(np.asarray(out_inline), np.asarray(out_hoisted))


def test_tile_gate_falls_back_on_unaligned_resolutions():
    """dcn_impl='tile' at a resolution violating the Pallas kernel's
    packed-operand alignment ((w+2·ptx) % (8·xpack) != 0) must fall back to
    the patch path instead of a trace-time kernel AssertionError
    (ADVICE r2 medium)."""
    import numpy as np

    from flair_tpu.models.vsrpp import SecondOrderDeformableAlignment

    c = 128
    # w=20: (20+64) % 16 = 4 → tile kernel ineligible for cin=128 (xpack=2)
    b, h, w = 1, 20, 20
    m = SecondOrderDeformableAlignment(
        c, deform_groups=16, max_residue_magnitude=5.0, dcn_impl="tile")
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(b, h, w, c), jnp.float32)
    extra = jnp.asarray(rs.rand(b, h, w, 2 * c + 4), jnp.float32)
    f1 = jnp.asarray(rs.rand(b, h, w, 2), jnp.float32)
    f2 = jnp.asarray(rs.rand(b, h, w, 2), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, extra, f1, f2)
    out = m.apply(params, x, extra, f1, f2)
    assert out.shape == (b, h, w, c)
    assert np.isfinite(np.asarray(out)).all()
