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


def test_vsrpp_hoisted_scan_matches_module_loop():
    """The round-5 propagation rewrite (pure lax.scan + frame-batched
    hoisting of the offset_conv0/backbone-conv_in xs halves, VERDICT r4
    #2) against a straightforward per-frame module loop — the r4
    formulation, which computed each conv whole inside the scan. Conv
    linearity makes the split exact up to f32 reassociation; assert the
    full bidirectional output matches to 1e-5."""
    from flax.core import freeze, unfreeze

    from flair_tpu.models.vsrpp import (
        BasicVSRPP, ResidualBlocksWithInputConv,
        SecondOrderDeformableAlignment, compose_second_order_flows)
    from flair_tpu.ops.warp import flow_warp

    b, t, h, w, c, g, mrm = 1, 4, 8, 8, 8, 2, 5.0
    hidden = rand(b, t, h, w, c, seed=2) * 0.5
    fwd_f = rand(b, t - 1, h, w, 2, seed=3) * 0.7
    bwd_f = rand(b, t - 1, h, w, 2, seed=4) * 0.7
    wmap = jax.nn.sigmoid(rand(b, t, h, w, 1, seed=5))
    mod = BasicVSRPP(features=c, deform_groups=g, max_residue_magnitude=mrm)
    params = mod.init(jax.random.PRNGKey(0), hidden, fwd_f, bwd_f, wmap)
    # randomize every leaf (zero-init offset_out/conv_last would make the
    # hoisting trivially untested)
    leaves, tdef = jax.tree_util.tree_flatten(unfreeze(params))
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = freeze(jax.tree_util.tree_unflatten(
        tdef, [0.1 * jax.random.normal(k, l.shape, l.dtype)
               for k, l in zip(keys, leaves)]))
    out = mod.apply(params, hidden, fwd_f, bwd_f, wmap)

    # ---- reference loop: per-frame module calls (r4 in-scan math) -------
    p = unfreeze(params)["params"]
    align = SecondOrderDeformableAlignment(
        c, deform_groups=g, max_residue_magnitude=mrm)
    fwd2, bwd2 = compose_second_order_flows(fwd_f, bwd_f)

    def branch(br, frames, extra, n1_flows, n2_flows):
        backbone = ResidualBlocksWithInputConv(c, 1)
        p1 = p2 = jnp.zeros((b, h, w, c))
        outs = []
        for i, j in enumerate(frames):
            feat = hidden[:, j]
            if i == 0:
                prop_al = jnp.zeros((b, h, w, c))
            else:
                f1, f2 = n1_flows[i], n2_flows[i]
                f1x, f1y = f1[..., 0], f1[..., 1]
                f2x, f2y = f2[..., 0], f2[..., 1]
                cond1 = flow_warp(p1, (f1x, f1y))
                cond2 = flow_warp(p2, (f2x, f2y))
                cond = jnp.concatenate([cond1, feat, cond2], -1)
                prop_al = align.apply(
                    {"params": p[br]["deform_align"]},
                    jnp.concatenate([p1, p2], -1), cond,
                    (f1x, f1y), (f2x, f2y))
            ex = [extra[:, j]] if extra is not None else []
            feat_in = jnp.concatenate([feat, *ex, prop_al], -1)
            prop = prop_al + backbone.apply(
                {"params": p[br]["backbone"]}, feat_in)
            prop = prop * wmap[:, j]
            outs.append(prop)
            p1, p2 = prop, p1
        return outs

    frames_b = list(range(t))[::-1]
    n1_b = [bwd_f[:, j] if j <= t - 2 else jnp.zeros((b, h, w, 2))
            for j in frames_b]
    n2_b = [bwd2[:, j] for j in frames_b]
    outs_b = branch("backward_1", frames_b, None, n1_b, n2_b)
    bwd_feat = jnp.stack(outs_b[::-1], axis=1)

    frames_f = list(range(t))
    n1_f = [fwd_f[:, j - 1] if j >= 1 else jnp.zeros((b, h, w, 2))
            for j in frames_f]
    n2_f = [fwd2[:, j] for j in frames_f]
    outs_f = branch("forward_1", frames_f, bwd_feat, n1_f, n2_f)
    fwd_feat = jnp.stack(outs_f, axis=1)

    hr = jnp.concatenate([hidden, bwd_feat, fwd_feat], -1)
    hr = ResidualBlocksWithInputConv(c, 1).apply(
        {"params": p["reconstruction"]}, hr.reshape(b * t, h, w, 3 * c))
    kl, bl = p["conv_last"]["kernel"], p["conv_last"]["bias"]
    hr = jax.lax.conv_general_dilated(
        hr, kl, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bl
    expected = hidden + hr.reshape(b, t, h, w, c)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5)


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
