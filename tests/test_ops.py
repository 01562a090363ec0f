"""Parity & property tests for flair_tpu.ops (SURVEY.md §4 layer 1-2).

Golden references: scipy (DCT), torch CPU (interpolate/grid_sample/GroupNorm),
cv2 (cubic kernel synthesis, Gaussian blur), and obvious-loop numpy
implementations (deformable conv, temporal window attention).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from flair_tpu import ops


def rand(*shape, seed=0, dtype=np.float32):
    return np.random.RandomState(seed).randn(*shape).astype(dtype)


# ---------------------------------------------------------------------------
# DCT / JPEG
# ---------------------------------------------------------------------------


def test_dct_matches_scipy():
    import scipy.fft

    x = rand(4, 8)
    got = np.asarray(ops.dct.dct(jnp.asarray(x), norm="ortho"))
    want = scipy.fft.dct(x, norm="ortho", axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)
    # non-ortho variant (reference default norm=None, dct.py:31-61)
    got = np.asarray(ops.dct.dct(jnp.asarray(x)))
    want = scipy.fft.dct(x, axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_idct_roundtrip():
    x = jnp.asarray(rand(3, 8))
    for norm in (None, "ortho"):
        y = ops.dct.idct(ops.dct.dct(x, norm), norm)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_dct1_roundtrip():
    x = jnp.asarray(rand(2, 9))
    np.testing.assert_allclose(
        np.asarray(ops.dct.idct1(ops.dct.dct1(x))), np.asarray(x), atol=1e-5
    )


def test_block_dct8_roundtrip_and_blockwise():
    import scipy.fft

    x = rand(2, 16, 24)
    y = np.asarray(ops.block_dct8(jnp.asarray(x)))
    # blockwise equality with scipy 2-D ortho DCT
    blk = x[0, 8:16, 8:16]
    want = scipy.fft.dctn(blk, norm="ortho")
    np.testing.assert_allclose(y[0, 8:16, 8:16], want, atol=1e-4)
    back = np.asarray(ops.block_idct8(jnp.asarray(y)))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_jpeg_roundtrip_reasonable():
    # smooth image should survive qf=90 nearly intact; qf=10 degrades more
    g = np.linspace(-0.8, 0.8, 32)
    img = np.stack(
        [np.add.outer(g, g) / 2, np.subtract.outer(g, g) / 2, np.tile(g, (32, 1))],
        axis=-1,
    )[None].astype(np.float32)
    x = jnp.asarray(img)
    err90 = float(jnp.abs(ops.jpeg_decode(ops.jpeg_encode(x, 90), 90) - x).mean())
    err10 = float(jnp.abs(ops.jpeg_decode(ops.jpeg_encode(x, 10), 10) - x).mean())
    assert err90 < 0.02, err90
    assert err90 < err10


def test_jpeg_quant_matrix_parity_with_reference_formula():
    # reference jpeg.py:59-69 (torch) re-run in numpy
    for qf in (10, 50, 60, 90):
        q1, q2 = ops.quantization_matrix(qf)
        s = (5000 / qf) if qf < 50 else (200 - 2 * qf)
        base = np.floor(
            (s * np.array([16, 11, 10, 12, 99], dtype=np.float64) + 50) / 100
        )
        base = np.clip(base, 1, 255)
        np.testing.assert_allclose(q1.flatten()[[0, 1, 2]], base[[0, 1, 2]])


def test_ycbcr_roundtrip():
    x = jnp.asarray(np.random.RandomState(1).uniform(0, 255, (2, 4, 4, 3)))
    back = ops.ycbcr_to_rgb(ops.rgb_to_ycbcr(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=0.2)


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------


def test_cubic_kernel_matches_cv2_delta_construction():
    cv2 = pytest.importorskip("cv2")
    for sf in (2, 4, 8):
        D = 11
        delta = np.zeros((D, D))
        c = int(np.ceil(D / 2)) - 1
        delta[c, c] = 1.0
        up = cv2.resize(delta, dsize=(sf * D, sf * D), interpolation=cv2.INTER_CUBIC)
        row = up[sf * int(np.ceil(D / 2)) - 1, :]
        nz = np.nonzero(row)[0]
        want_2d = up[nz[0] : nz[-1] + 1, nz[0] : nz[-1] + 1]
        got_2d = ops.cubic_kernel_2d(sf)
        assert got_2d.shape == want_2d.shape, (sf, got_2d.shape, want_2d.shape)
        np.testing.assert_allclose(got_2d, want_2d, atol=1e-6)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear", "area"])
@pytest.mark.parametrize("sizes", [(16, 64), (64, 16), (24, 36)])
def test_resize_matches_torch_interpolate(mode, sizes):
    import torch
    import torch.nn.functional as F

    s_in, s_out = sizes
    x = rand(2, s_in, s_in, 3, seed=3)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    kwargs = {} if mode == "area" else dict(align_corners=False)
    want = F.interpolate(xt, size=(s_out, s_out), mode=mode, **kwargs).numpy()
    fn = {
        "bicubic": ops.resize_bicubic,
        "bilinear": ops.resize_bilinear,
        "area": ops.resize_area,
    }[mode]
    got = np.asarray(fn(jnp.asarray(x), (s_out, s_out))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_imresize_efficient_shapes_and_dc():
    # downscaling a constant image must stay constant (reflect pad, sum-1 kernel)
    k, pre, post = ops.imresize_kernel(4)
    x = jnp.ones((1, 32, 32, 3))
    y = ops.imresize_efficient(x, k, 4, pre, post)
    assert y.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(y), 1.0, atol=1e-4)


def _import_reference(modname):
    """Import a reference module for golden-value comparison, shimming the
    scipy.signal.gaussian→scipy.signal.windows.gaussian rename."""
    import importlib
    import sys

    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "gaussian"):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    if "torchvision" not in sys.modules:
        # minimal stub: pseudoSR only references torchvision at import time
        import types

        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.functional = types.ModuleType("torchvision.transforms.functional")
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
        sys.modules["torchvision.transforms.functional"] = tf.functional
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    return importlib.import_module(modname)


def test_center_mass_matches_reference():
    """Parity with the reference Center_Mass (imresize_pseudoSR.py:121-157),
    executed directly from /root/reference (it needs only torch/cv2/scipy)."""
    try:
        Center_Mass = _import_reference(
            "guided_diffusion.imresize_pseudoSR"
        ).Center_Mass
    except Exception:
        pytest.skip("reference not importable")
    g = ops.gaussian_kernel_1d(25, 2.0)
    k = np.outer(g, g)
    want = Center_Mass(k.copy(), ds_factor=4)
    got = ops.center_mass(k, ds_factor=4)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_imresize_kernel_matches_reference_return_kernel():
    """pseudoSR.Return_kernel parity for the plain x4-cubic path."""
    try:
        Return_kernel = _import_reference(
            "guided_diffusion.pseudoSR"
        ).Return_kernel
    except Exception:
        pytest.skip("reference not importable")
    want_k, want_pre, want_post = Return_kernel(4)
    got_k, got_pre, got_post = ops.imresize_kernel(4)
    assert got_k.shape == want_k.shape, (got_k.shape, want_k.shape)
    np.testing.assert_allclose(got_k, want_k, atol=1e-6)
    np.testing.assert_array_equal(got_pre, want_pre)
    np.testing.assert_array_equal(got_post, want_post)


# ---------------------------------------------------------------------------
# Warp / grid sample
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("pad", ["zeros", "border"])
def test_grid_sample_matches_torch(align, pad):
    import torch
    import torch.nn.functional as F

    x = rand(2, 8, 10, 3, seed=5)
    grid = np.random.RandomState(6).uniform(-1.3, 1.3, (2, 6, 7, 2)).astype(np.float32)
    want = F.grid_sample(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid),
        mode="bilinear",
        padding_mode=pad,
        align_corners=align,
    ).numpy()
    got = np.asarray(
        ops.grid_sample(
            jnp.asarray(x), jnp.asarray(grid), padding_mode=pad, align_corners=align
        )
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_flow_warp_zero_flow_identity():
    x = jnp.asarray(rand(1, 9, 9, 4))
    flow = jnp.zeros((1, 9, 9, 2))
    np.testing.assert_allclose(
        np.asarray(ops.flow_warp(x, flow)), np.asarray(x), atol=1e-6
    )


def test_flow_warp_integer_shift():
    x = rand(1, 8, 8, 1, seed=9)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 0] = 1.0  # sample from x+1 (shift left)
    got = np.asarray(ops.flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(got[0, :, :-1, 0], x[0, :, 1:, 0], atol=1e-6)


def test_warp_affine_identity_and_translation():
    x = rand(1, 8, 8, 3, seed=11)
    m = np.tile(np.array([[[1, 0, 0], [0, 1, 0]]], np.float32), (1, 1, 1))
    got = np.asarray(ops.warp_affine(jnp.asarray(x), jnp.asarray(m), (8, 8)))
    np.testing.assert_allclose(got, x, atol=1e-5)
    # shift dst by +2 in x: dst[x] = src[x-2]
    m = np.tile(np.array([[[1, 0, 2], [0, 1, 0]]], np.float32), (1, 1, 1))
    got = np.asarray(ops.warp_affine(jnp.asarray(x), jnp.asarray(m), (8, 8)))
    np.testing.assert_allclose(got[0, :, 2:, :], x[0, :, :-2, :], atol=1e-5)


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------


def test_group_norm_matches_torch():
    import torch

    x = rand(2, 6, 5, 8, seed=13)  # NHWC
    wgt = rand(8, seed=14)
    bias = rand(8, seed=15)
    gn = torch.nn.GroupNorm(4, 8)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(wgt))
        gn.bias.copy_(torch.from_numpy(bias))
    want = gn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()
    got = np.asarray(
        ops.group_norm(jnp.asarray(x), 4, jnp.asarray(wgt), jnp.asarray(bias))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_shift_window_group_norm_matches_unfold_reference():
    # naive unfold implementation of nn.py:657-748 semantics
    b, t, h, w, c, g, win = 1, 5, 3, 3, 8, 4, 3
    x = rand(b, t, h, w, c, seed=17)
    pad = win // 2
    xp = np.concatenate(
        [np.repeat(x[:, :1], pad, 1), x, np.repeat(x[:, -1:], pad, 1)], axis=1
    )
    want = np.empty_like(x)
    for ti in range(t):
        window = xp[:, ti : ti + win]  # (b, win, h, w, c)
        grp = window.reshape(b, win, h, w, g, c // g)
        mean = grp.mean(axis=(1, 2, 3, 5), keepdims=True)
        var = grp.var(axis=(1, 2, 3, 5), keepdims=True)
        cur = x[:, ti].reshape(b, 1, h, w, g, c // g)
        want[:, ti] = (
            ((cur - mean) / np.sqrt(var + 1e-5)).reshape(b, h, w, c)
        )
    got = np.asarray(ops.shift_window_group_norm(jnp.asarray(x), g, win))
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Embeddings / shuffle / blur / EMA
# ---------------------------------------------------------------------------


def test_timestep_embedding_matches_reference_formula():
    import math

    t = np.array([0.0, 1.0, 17.0, 999.0], np.float32)
    dim = 12
    half = dim // 2
    freqs = np.exp(-math.log(10000) * np.arange(half) / half)
    args = t[:, None] * freqs[None]
    want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    got = np.asarray(ops.timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sr3_noise_embedding_order():
    # sr3.py:45-61: sin first, then cos
    lvl = np.array([0.3], np.float32)
    got = np.asarray(ops.sr3_noise_embedding(jnp.asarray(lvl), 8))
    import math

    step = np.arange(4) / 4
    enc = lvl[:, None] * np.exp(-math.log(1e4) * step[None])
    want = np.concatenate([np.sin(enc), np.cos(enc)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pixel_shuffle_matches_torch():
    import torch

    x = rand(2, 3, 4, 16, seed=19)
    want = torch.pixel_shuffle(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), 2
    ).numpy()
    got = np.asarray(ops.pixel_shuffle(jnp.asarray(x), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)
    back = ops.pixel_unshuffle(ops.pixel_shuffle(jnp.asarray(x), 2), 2)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


def test_gaussian_blur_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    x = rand(1, 16, 16, 3, seed=21)
    want = cv2.GaussianBlur(x[0], (7, 7), 2.0)
    got = np.asarray(ops.gaussian_blur(jnp.asarray(x), 7, 2.0))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ema_update():
    p = {"a": jnp.ones(3), "b": jnp.zeros(2)}
    e = {"a": jnp.zeros(3), "b": jnp.ones(2)}
    out = ops.ema_update(e, p, rate=0.9)
    np.testing.assert_allclose(np.asarray(out["a"]), 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.9, atol=1e-6)


# ---------------------------------------------------------------------------
# Patchify / unpatchify
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("merge", ["mean", "linear", "mid", "max", "min"])
def test_patch_roundtrip_identity(merge):
    x = jnp.asarray(rand(1, 6, 8, 8, 2, seed=23))
    blocks, meta = ops.patchify(x, (4, 4, 4), (2, 4, 4))
    out = ops.unpatchify(blocks, meta, merge=merge)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_process_patched_applies_fn():
    x = jnp.asarray(rand(1, 4, 8, 8, 1, seed=24))
    out = ops.patch.process_patched(x, lambda b: b * 2.0, (2, 4, 4), (2, 4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def test_dot_product_attention_matches_torch_sdpa():
    import torch

    q = rand(2, 5, 2, 8, seed=25)
    k = rand(2, 7, 2, 8, seed=26)
    v = rand(2, 7, 2, 8, seed=27)
    want = (
        torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q.transpose(0, 2, 1, 3)),
            torch.from_numpy(k.transpose(0, 2, 1, 3)),
            torch.from_numpy(v.transpose(0, 2, 1, 3)),
        )
        .numpy()
        .transpose(0, 2, 1, 3)
    )
    got = np.asarray(ops.dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # flash_attention falls back to the same math on CPU
    got2 = np.asarray(ops.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    np.testing.assert_allclose(got2, want, atol=1e-5)


def test_temporal_window_attention_matches_unfold_reference():
    # naive unfold implementation of unet.py:712-758
    b, t, h, w, c, heads, f = 1, 5, 2, 2, 8, 2, 3
    rs = np.random.RandomState(31)
    x = rs.randn(b, t, h, w, c).astype(np.float32)
    q_emb = rs.randn(c).astype(np.float32)  # projected t_mid term
    k_pos = rs.randn(f - 1, c).astype(np.float32)  # projected t_rest terms
    wq = rs.randn(c, c).astype(np.float32) * 0.2
    wk = rs.randn(c, c).astype(np.float32) * 0.2
    wv = rs.randn(c, c).astype(np.float32) * 0.2

    q_center = x @ wq + q_emb
    k_frames = x @ wk
    v_frames = x @ wv
    got = np.asarray(
        ops.temporal_window_attention(
            jnp.asarray(q_center),
            jnp.asarray(k_frames),
            jnp.asarray(v_frames),
            jnp.asarray(k_pos),
            num_frames=f,
            num_heads=heads,
        )
    )

    # reference: replicate-pad frames, unfold, per-pixel softmax attention
    pad = f // 2
    xp = np.concatenate(
        [np.repeat(x[:, :1], pad, 1), x, np.repeat(x[:, -1:], pad, 1)], 1
    )
    dh = c // heads
    want = np.empty_like(x)
    for ti in range(t):
        win = xp[:, ti : ti + f]  # (b, f, h, w, c)
        q = (x[:, ti] @ wq + q_emb).reshape(b, h, w, heads, dh)
        others = [j for j in range(f) if j != f // 2]
        ks = np.stack(
            [win[:, j] @ wk + k_pos[idx] for idx, j in enumerate(others)], 1
        ).reshape(b, f - 1, h, w, heads, dh)
        vs = np.stack([win[:, j] @ wv for j in others], 1).reshape(
            b, f - 1, h, w, heads, dh
        )
        logits = np.einsum("bhwnd,bfhwnd->bhwnf", q, ks) / np.sqrt(dh)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        want[:, ti] = np.einsum("bhwnf,bfhwnd->bhwnd", p, vs).reshape(b, h, w, c)
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# Deformable conv
# ---------------------------------------------------------------------------


def _naive_deform_conv(x, offset, mask, weight, bias, stride, padding, dilation):
    """Obvious-loop NHWC modulated deform conv (DCNv2 semantics)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    _, ho, wo, g, k, _ = offset.shape
    cg = cin // g
    out = np.zeros((b, ho, wo, cout), np.float64)

    def sample(img, y, xx):
        h_, w_ = img.shape[:2]
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        fy, fx = y - y0, xx - x0
        val = np.zeros(img.shape[-1])
        for dy, wy in ((0, 1 - fy), (1, fy)):
            for dx, wx in ((0, 1 - fx), (1, fx)):
                yy, xc = y0 + dy, x0 + dx
                if 0 <= yy < h_ and 0 <= xc < w_:
                    val += wy * wx * img[yy, xc]
        return val

    for bi in range(b):
        for yo in range(ho):
            for xo in range(wo):
                col = np.zeros((kh * kw, cin))
                for ky in range(kh):
                    for kx in range(kw):
                        ki = ky * kw + kx
                        for gi in range(g):
                            dy, dx = offset[bi, yo, xo, gi, ki]
                            sy = yo * stride - padding + ky * dilation + dy
                            sx = xo * stride - padding + kx * dilation + dx
                            v = sample(
                                x[bi, :, :, gi * cg : (gi + 1) * cg], sy, sx
                            )
                            col[ki, gi * cg : (gi + 1) * cg] = (
                                v * mask[bi, yo, xo, gi, ki]
                            )
                for ky in range(kh):
                    for kx in range(kw):
                        out[bi, yo, xo] += col[ky * kw + kx] @ weight[ky, kx]
    if bias is not None:
        out += bias
    return out


def test_deform_conv2d_matches_naive():
    rs = np.random.RandomState(41)
    b, h, w, cin, cout, g = 1, 5, 6, 4, 3, 2
    x = rs.randn(b, h, w, cin).astype(np.float32)
    offset = (rs.randn(b, h, w, g, 9, 2) * 1.5).astype(np.float32)
    mask = rs.uniform(0, 1, (b, h, w, g, 9)).astype(np.float32)
    weight = (rs.randn(3, 3, cin, cout) * 0.3).astype(np.float32)
    bias = rs.randn(cout).astype(np.float32)
    got = np.asarray(
        ops.modulated_deform_conv2d(
            jnp.asarray(x),
            jnp.asarray(offset),
            jnp.asarray(mask),
            jnp.asarray(weight),
            jnp.asarray(bias),
            stride=1,
            padding=1,
            dilation=1,
        )
    )
    want = _naive_deform_conv(x, offset, mask, weight, bias, 1, 1, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deform_conv2d_zero_offset_equals_conv():
    rs = np.random.RandomState(43)
    x = rs.randn(1, 6, 6, 4).astype(np.float32)
    weight = (rs.randn(3, 3, 4, 5) * 0.3).astype(np.float32)
    offset = np.zeros((1, 6, 6, 1, 9, 2), np.float32)
    got = np.asarray(
        ops.deform_conv2d(
            jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight), padding=1
        )
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x),
            jnp.asarray(weight),
            (1, 1),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# flow-anchored patch DCN (ops/deform.deform_conv2d_patch)
# ---------------------------------------------------------------------------


def test_deform_patch_matches_gather():
    """Patch path == exact gather path to f32 roundoff whenever residues fit
    the patch (bound: |residue| <= ps/2 - 2), including large flows that move
    the anchor across / beyond the image boundary."""
    import jax
    import jax.numpy as jnp

    from flair_tpu.ops.deform import deform_conv2d, deform_conv2d_patch

    B, H, G, K, CIN, COUT = 1, 16, 4, 9, 8, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, H, H, CIN), jnp.float32)
    wt = jax.random.normal(ks[4], (3, 3, CIN, COUT), jnp.float32) * 0.2
    bias = jax.random.normal(ks[5], (COUT,), jnp.float32) * 0.1
    mask = jax.nn.sigmoid(jax.random.normal(ks[3], (B, H, H, G, K), jnp.float32))

    for flow_scale, ps, res_bound in ((2.0, 8, 1.5), (40.0, 12, 3.5)):
        flow = jax.random.uniform(ks[1], (B, H, H, 2, 2), jnp.float32,
                                  -flow_scale, flow_scale)
        res = jax.random.uniform(ks[2], (B, H, H, G, K, 2), jnp.float32,
                                 -res_bound, res_bound)
        off = jnp.repeat(flow, G // 2, axis=3)[:, :, :, :, None, :] + res
        a = deform_conv2d(x, off, wt, bias, mask=mask, padding=1)
        b = deform_conv2d_patch(x, flow, off, wt, bias, mask=mask,
                                patch_size=ps)
        assert float(jnp.abs(a - b).max()) < 1e-5


def test_vsrpp_patch_mode_matches_gather_mode():
    """BasicVSRPP(dcn_patch_size='auto') == dcn_patch_size=None with shared
    params (auto patch covers the full tanh residue range for M <= 6)."""
    import jax
    import jax.numpy as jnp

    from flair_tpu.models.vsrpp import BasicVSRPP

    b, t, h, w, c = 1, 3, 16, 16, 8
    hid = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, w, c))
    ff = jax.random.uniform(jax.random.PRNGKey(1), (b, t - 1, h, w, 2),
                            minval=-2, maxval=2)
    fb = jax.random.uniform(jax.random.PRNGKey(2), (b, t - 1, h, w, 2),
                            minval=-2, maxval=2)
    m_fast = BasicVSRPP(c, max_residue_magnitude=5.0, deform_groups=2,
                        dcn_patch_size="auto")
    m_exact = BasicVSRPP(c, max_residue_magnitude=5.0, deform_groups=2,
                         dcn_patch_size=None)
    params = m_fast.init(jax.random.PRNGKey(3), hid, ff, fb)
    o1 = m_fast.apply(params, hid, ff, fb)
    o2 = m_exact.apply(params, hid, ff, fb)
    assert float(jnp.abs(o1 - o2).max()) < 1e-5


def test_dct_3d_round_trip_and_scipy_parity():
    """3-D DCT appliers (dct.py:136-165): ortho round trip + scipy parity."""
    import numpy as np
    import jax.numpy as jnp
    from scipy.fft import dctn

    from flair_tpu.ops.dct import dct_3d, idct_3d

    x = np.random.RandomState(0).randn(2, 4, 8, 8).astype(np.float32)
    y = dct_3d(jnp.asarray(x), norm="ortho")
    ref = dctn(x, type=2, norm="ortho", axes=(-3, -2, -1))
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
    back = idct_3d(y, norm="ortho")
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-4)


def test_flash_attention_routes_to_pallas_for_flagship_heads(monkeypatch):
    """The flagship UNets use 64-channel heads; the Pallas flash kernel must
    actually be in the traced program for those shapes (VERDICT round-1: the
    kernel was dead code because d=64 fell back to the einsum). Routing is
    checked by jaxpr inspection with the backend gate patched; the kernel's
    numerics/speed are measured on the real chip (PERF.md)."""
    import jax
    import jax.numpy as jnp

    import flair_tpu.ops.attention as A

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    q = jnp.zeros((2, 1024, 8, 64), jnp.bfloat16)
    jaxpr = jax.make_jaxpr(lambda q: A.flash_attention(q, q, q))(q)
    prims = {eqn.primitive.name for eqn in jaxpr.eqns} | {
        e2.primitive.name
        for eqn in jaxpr.eqns
        for v in eqn.params.values()
        if hasattr(v, "eqns")
        for e2 in v.eqns
    }
    assert any("pallas" in p for p in prims), sorted(prims)

    # odd shapes must still fall back to the einsum path
    q2 = jnp.zeros((2, 100, 8, 48), jnp.bfloat16)
    jaxpr2 = jax.make_jaxpr(lambda q: A.flash_attention(q, q, q))(q2)
    prims2 = {eqn.primitive.name for eqn in jaxpr2.eqns}
    assert not any("pallas" in p for p in prims2)


class TestDCNTilePallas:
    """Tile-anchored Pallas DCN (ops/dcn_pallas) vs the exact gather path."""

    def _mk(self, key, h=16, w=32, cin=128, cout=64, g=16, amp=2.5, M=2.0):
        import jax

        ks = jax.random.split(key, 6)
        b, a = 1, 2
        x = jax.random.normal(ks[0], (b, h, w, cin), jnp.float32)
        yy = jnp.arange(h)[None, :, None, None, None] / h
        xx = jnp.arange(w)[None, None, :, None, None] / w
        ph = jax.random.uniform(ks[1], (1, 1, 1, a, 2)) * 6.28
        flow = amp * jnp.sin(2 * 3.1416 * (yy + xx) + ph) * jnp.ones(
            (b, h, w, a, 2))
        res = jnp.tanh(jax.random.normal(ks[2], (b, h, w, g, 9, 2))) * M
        off = jnp.repeat(flow, g // a, axis=3)[:, :, :, :, None, :] + res
        mask = jax.nn.sigmoid(jax.random.normal(ks[3], (b, h, w, g, 9)))
        wgt = jax.random.normal(ks[4], (3, 3, cin, cout), jnp.float32) * 0.1
        bias = jax.random.normal(ks[5], (cout,)) * 0.1
        return x, flow, off, mask, wgt, bias

    def test_matches_exact_path_when_no_escapes(self):
        import jax

        from flair_tpu.ops.dcn_pallas import (
            deform_conv2d_tile, tile_escape_fraction)
        from flair_tpu.ops.deform import deform_conv2d

        x, flow, off, mask, wgt, bias = self._mk(jax.random.PRNGKey(0))
        assert float(tile_escape_fraction(
            flow, off, tile=(2, 4), patch=(16, 32))) == 0.0
        ref = deform_conv2d(x, off, wgt, bias, mask=mask)
        out = deform_conv2d_tile(
            x, flow, off, wgt, bias, mask=mask,
            tile=(2, 4), patch=(16, 32), ntb=8, interpret=True)
        # kernel computes in bf16
        err = jnp.mean(jnp.abs(ref - out)) / jnp.mean(jnp.abs(ref))
        assert float(err) < 0.02

    def test_matches_exact_path_cin256_unpacked(self):
        """ca=128 / xpack=1 (the 256-resolution VSR++ sites)."""
        import jax

        from flair_tpu.ops.dcn_pallas import deform_conv2d_tile
        from flair_tpu.ops.deform import deform_conv2d

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(5), h=16, w=32, cin=256, cout=128,
            amp=1.5, M=2.0)
        ref = deform_conv2d(x, off, wgt, bias, mask=mask)
        out = deform_conv2d_tile(
            x, flow, off, wgt, bias, mask=mask,
            tile=(4, 4), patch=(20, 32), ntb=4, lane_slice=True,
            interpret=True)
        err = jnp.mean(jnp.abs(ref - out)) / jnp.mean(jnp.abs(ref))
        assert float(err) < 0.02, float(err)

    @pytest.mark.parametrize("tile,patch,ntb,lane", [
        ((4, 4), (20, 32), 8, False),
        ((4, 4), (20, 32), 8, True),
        ((4, 8), (20, 32), 4, True),
        ((8, 8), (24, 32), 2, True),
        ((2, 4), (16, 32), 8, True),
    ])
    def test_matches_exact_path_all_tile_configs(self, tile, patch, ntb, lane):
        """Every config the perf sweep times must be numerically sound
        (interpret mode; smooth flow, residues within the patch budget)."""
        import jax

        from flair_tpu.ops.dcn_pallas import (
            deform_conv2d_tile, tile_escape_fraction)
        from flair_tpu.ops.deform import deform_conv2d

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(3), amp=1.5, M=2.0)
        ref = deform_conv2d(x, off, wgt, bias, mask=mask)
        out = deform_conv2d_tile(
            x, flow, off, wgt, bias, mask=mask,
            tile=tile, patch=patch, ntb=ntb, lane_slice=lane, interpret=True)
        err = jnp.mean(jnp.abs(ref - out)) / jnp.mean(jnp.abs(ref))
        assert float(err) < 0.02, float(err)

    @pytest.mark.parametrize("bc_div,ntb2", [(3, 4), (9, 2), (3, 1)])
    def test_chunked_build_and_subbatch_match_unchunked(self, bc_div, ntb2):
        """build_chunk/ntb2 are pure VMEM chunkings — results must be
        bit-identical to the unchunked kernel (same dots, disjoint rows)."""
        import jax

        from flair_tpu.ops.dcn_pallas import deform_conv2d_tile

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(7), amp=1.5, M=2.0)
        kwargs = dict(mask=mask, tile=(2, 4), patch=(16, 32), ntb=8,
                      interpret=True)
        ref = deform_conv2d_tile(x, flow, off, wgt, bias, **kwargs)
        r = 9 * 8 * 8  # kk * tpix * ga
        out = deform_conv2d_tile(
            x, flow, off, wgt, bias, build_chunk=r // bc_div, ntb2=ntb2,
            **kwargs)
        assert jnp.array_equal(ref, out)

    def test_int8_dots_match_exact_path_within_quant_budget(self):
        """Round-5 int8 window dots (deform_conv2d_tile(int8_dots=True)):
        the value operand quantizes symmetrically against its global max
        and the in-kernel window weights ride a fixed 1/127 scale; the
        result must stay within the documented ~1% relative budget of the
        exact gather path (vs the bf16 kernel's ~0.3%)."""
        import jax

        from flair_tpu.ops.dcn_pallas import deform_conv2d_tile
        from flair_tpu.ops.deform import deform_conv2d

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(21), amp=1.5, M=2.0)
        ref = deform_conv2d(x, off, wgt, bias, mask=mask)
        out = deform_conv2d_tile(
            x, flow, off, wgt, bias, mask=mask,
            tile=(2, 4), patch=(16, 32), ntb=8, interpret=True,
            int8_dots=True)
        err = jnp.mean(jnp.abs(ref - out)) / jnp.mean(jnp.abs(ref))
        assert float(err) < 0.03, float(err)
        # and for the unpacked cin=256 class
        x2, flow2, off2, mask2, wgt2, bias2 = self._mk(
            jax.random.PRNGKey(22), h=16, w=32, cin=256, cout=128,
            amp=1.5, M=2.0)
        ref2 = deform_conv2d(x2, off2, wgt2, bias2, mask=mask2)
        out2 = deform_conv2d_tile(
            x2, flow2, off2, wgt2, bias2, mask=mask2,
            tile=(2, 4), patch=(16, 32), ntb=8, interpret=True,
            int8_dots=True)
        err2 = jnp.mean(jnp.abs(ref2 - out2)) / jnp.mean(jnp.abs(ref2))
        assert float(err2) < 0.03, float(err2)

    def test_escape_fraction_flags_rough_flow(self):
        import jax

        from flair_tpu.ops.dcn_pallas import tile_escape_fraction

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(1), amp=0.0, M=2.0)
        # per-pixel random flow with huge gradients -> escapes
        rough = jax.random.normal(
            jax.random.PRNGKey(2), flow.shape, jnp.float32) * 12.0
        off_r = jnp.repeat(rough, 8, axis=3)[:, :, :, :, None, :] + (
            off - jnp.repeat(flow, 8, axis=3)[:, :, :, :, None, :])
        frac = float(tile_escape_fraction(
            rough, off_r, tile=(2, 4), patch=(16, 32)))
        assert frac > 0.05

    def test_split_and_flat_offsets_match_stacked(self):
        """The serving call shape: split (oy, ox) tuples — 5-D or
        channel-flat (B,H,W,G·K) — must be bit-identical to the stacked
        (…,2) form (same lanes() dot on the same bytes)."""
        import jax

        from flair_tpu.ops.dcn_pallas import deform_conv2d_tile

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(11), amp=1.5, M=2.0)
        kwargs = dict(mask=mask, tile=(2, 4), patch=(16, 32), ntb=8,
                      interpret=True)
        ref = deform_conv2d_tile(x, flow, off, wgt, bias, **kwargs)
        out5 = deform_conv2d_tile(
            x, flow, (off[..., 0], off[..., 1]), wgt, bias, **kwargs)
        b, h, w, g, k, _ = off.shape
        flat = lambda v: v.reshape(b, h, w, g * k)
        kwargs_flat = dict(kwargs, mask=flat(mask))
        outf = deform_conv2d_tile(
            x, flow, (flat(off[..., 0]), flat(off[..., 1])), wgt, bias,
            **kwargs_flat)
        assert jnp.array_equal(ref, out5)
        assert jnp.array_equal(ref, outf)

    def test_raw_prep_matches_materialized_offsets(self):
        """The serving prep: raw pre-activation logits + flows fed into
        the kernel's lane-space ``mrm·tanh(·)+flow`` must equal the
        materialized-offset path bit-for-bit (permutation commutes with
        elementwise; identical per-element op order)."""
        import jax

        from flair_tpu.ops.dcn_pallas import (
            _materialize_raw, deform_conv2d_tile)

        key = jax.random.PRNGKey(13)
        b, h, w, cin, g, cout, mrm = 1, 8, 16, 128, 16, 64, 2.0
        ks = jax.random.split(key, 6)
        x = jax.random.normal(ks[0], (b, h, w, cin), jnp.bfloat16)
        res_y = jax.random.normal(ks[1], (b, h, w, g * 9), jnp.bfloat16)
        res_x = jax.random.normal(ks[2], (b, h, w, g * 9), jnp.bfloat16)
        mlg = jax.random.normal(ks[3], (b, h, w, g * 9), jnp.bfloat16)
        # smooth-ish flows so samples stay inside the patch
        fy = jax.random.normal(ks[4], (b, h, w, 2), jnp.float32) * 1.5
        fx = jax.random.normal(ks[5], (b, h, w, 2), jnp.float32) * 1.5
        anchor = jnp.stack([fy, fx], axis=-1)  # (B,H,W,A,2) (dy,dx)
        wgt = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
        bias = jnp.zeros((cout,), jnp.float32)
        kwargs = dict(tile=(2, 4), patch=(16, 32), ntb=8, interpret=True)
        off, mask = _materialize_raw(res_y, res_x, mlg, fy, fx, mrm)
        ref = deform_conv2d_tile(
            x, anchor, off, wgt, bias, mask=mask, **kwargs)
        out = deform_conv2d_tile(
            x, anchor, None, wgt, bias,
            raw=(res_y, res_x, mlg, fy, fx), raw_mrm=mrm, **kwargs)
        assert jnp.array_equal(ref, out)

    def test_custom_vjp_gradients_flow(self):
        import jax

        from flair_tpu.ops.dcn_pallas import deform_conv2d_tile_ad

        x, flow, off, mask, wgt, bias = self._mk(
            jax.random.PRNGKey(3), h=8, w=16, cin=128, cout=32, g=4)

        def loss(x, wgt):
            # interpret path is exercised by the fwd test; here only the
            # backward wiring (patch-path VJP) matters, so keep shapes tiny
            from flair_tpu.ops.deform import deform_conv2d_patch

            out = deform_conv2d_patch(
                x, flow, off, wgt, bias, mask=mask, patch_size=8)
            return (out ** 2).mean()

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, wgt)
        assert jnp.isfinite(gx).all() and jnp.isfinite(gw).all()


def test_warp_affine_bicubic_matches_cv2_rotation_scale():
    """warp_affine(mode='bicubic') vs cv2.warpAffine(INTER_CUBIC) for
    rotation+scale matrices on both the crop and inverse-paste directions
    (face_restoration_helper.py:203,232-254). Border pixels touch the
    BORDER_CONSTANT boundary where cv2's cubic taps clamp differently, so
    compare on the interior."""
    import cv2

    from flair_tpu.ops import warp as W

    rs = np.random.RandomState(0)
    img = rs.rand(48, 40, 3).astype(np.float32)
    # similarity transform like cp2tform output: rotation+scale+shift
    for ang, scale, tx, ty, out_hw in [
        (17.0, 1.3, 3.2, -2.1, (40, 44)),
        (-31.0, 0.7, -4.5, 5.5, (52, 36)),
    ]:
        m = cv2.getRotationMatrix2D((20.0, 24.0), ang, scale)
        m[:, 2] += (tx, ty)
        ref = cv2.warpAffine(
            img, m, (out_hw[1], out_hw[0]), flags=cv2.INTER_CUBIC,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(0, 0, 0))
        got = np.asarray(W.warp_affine(
            jnp.asarray(img[None]), jnp.asarray(np.asarray(m)[None], jnp.float32),
            out_hw, mode="bicubic"))[0]
        # interior comparison: mask where all cubic taps are in-bounds
        inv = cv2.invertAffineTransform(m)
        ys, xs = np.meshgrid(np.arange(out_hw[0]), np.arange(out_hw[1]),
                             indexing="ij")
        sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
        sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
        interior = ((sx >= 2) & (sx < img.shape[1] - 3)
                    & (sy >= 2) & (sy < img.shape[0] - 3))
        d = np.abs(ref - got)[interior]
        assert d.max() < 5e-3, f"cubic warp mismatch {d.max()} (ang={ang})"

        # inverse paste-back direction
        minv = cv2.invertAffineTransform(m)
        ref2 = cv2.warpAffine(
            ref, minv, (img.shape[1], img.shape[0]), flags=cv2.INTER_CUBIC,
            borderMode=cv2.BORDER_CONSTANT, borderValue=(0, 0, 0))
        got2 = np.asarray(W.warp_affine(
            jnp.asarray(ref[None]),
            jnp.asarray(np.asarray(minv)[None], jnp.float32),
            (img.shape[0], img.shape[1]), mode="bicubic"))[0]
        # interior of the second warp
        ys2, xs2 = np.meshgrid(np.arange(img.shape[0]),
                               np.arange(img.shape[1]), indexing="ij")
        sxx = m[0, 0] * xs2 + m[0, 1] * ys2 + m[0, 2]
        syy = m[1, 0] * xs2 + m[1, 1] * ys2 + m[1, 2]
        interior2 = ((sxx >= 2) & (sxx < out_hw[1] - 3)
                     & (syy >= 2) & (syy < out_hw[0] - 3))
        d2 = np.abs(ref2 - got2)[interior2]
        assert d2.max() < 5e-3, f"inverse cubic warp mismatch {d2.max()}"


def test_dcn_tile_escape_quantified_for_both_unets():
    """VERDICT r1 item 6: quantify the conditional-exactness drop rate of
    the tile-anchored DCN under realistic offsets — smooth SPyNet-scale
    flows plus tanh-capped residues at trained-typical magnitude (most
    |residue| ≤ 3 even when M = 10, unet_new.py:871-874) — for the SR3
    (M=5, patch (16,32)) and ADM (M=10, patch (24,32)) configurations."""
    import jax

    from flair_tpu.ops.dcn_pallas import tile_escape_fraction

    b, h, w, g, a = 1, 64, 64, 16, 2
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    yy = jnp.arange(h)[None, :, None, None, None] / h
    xx = jnp.arange(w)[None, None, :, None, None] / w
    ph = jax.random.uniform(ks[0], (1, 1, 1, a, 2)) * 6.28
    flow = 8.0 * jnp.sin(2 * 3.1416 * (2 * yy + xx) + ph) * jnp.ones(
        (b, h, w, a, 2))
    base = jnp.repeat(flow, g // a, axis=3)[:, :, :, :, None, :]

    # (20, 32) is the shipped M=10 patch since round 5 (PERF.md: −17%
    # window-dot MACs, measured under budget); (24, 32) kept as the
    # conservative env-reachable fallback's bound
    for M, patch, budget in ((5.0, (16, 32), 2e-3), (10.0, (20, 32), 2e-2),
                             (10.0, (24, 32), 2e-2)):
        res = M * jnp.tanh(
            jax.random.normal(ks[1], (b, h, w, g, 9, 2)) * 0.3)
        off = base + res
        frac = float(tile_escape_fraction(
            flow, off, tile=(2, 4), patch=patch))
        assert frac < budget, f"M={M}: escape fraction {frac} over budget"
