"""AMT all-pairs-correlation frame interpolator
(re-design of amt.py:44-236 + amt_blocks/{raft,feat_enc,ifrnet,multi_flow}.py).

RAFT-style bidirectional correlation volume over 1/8-res features, 4-level
coarse-to-fine decoders with correlation-lookup update blocks, multi-flow
combination. Used by training to upsample temporally-decimated clips
(train_util.py:231-250).

Conv-transpose layers use flax SAME-padding 2x upconvs (kernel 4, stride 2);
the torch ConvTranspose2d(4,2,1) weight layout maps through
utils.checkpoint.t2j_conv2d with spatial flip at conversion time.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from ..ops.warp import flow_warp, grid_sample
from .registry import register_model

Array = jax.Array


def _resize2(x: Array, scale: float) -> Array:
    return resize_bilinear(
        x, (int(x.shape[1] * scale), int(x.shape[2] * scale))
    )


def _warp(img: Array, flow: Array) -> Array:
    """flow_utils.warp: bilinear, border padding, align_corners=True."""
    return flow_warp(img, flow, padding_mode="border", align_corners=True)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x):
        a = self.param(
            "prelu", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        )
        return jnp.where(x >= 0, x, a * x)


class ConvPReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        return PReLU(name="act")(x)


class UpConv(nn.Module):
    """2x transposed conv (torch ConvTranspose2d(4, 2, 1) geometry)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.ConvTranspose(
            self.features, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="deconv",
        )(x)


class IFRResBlock(nn.Module):
    """ifrnet.py ResBlock with side-channel mixing."""

    side_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = self.side_channels
        out = ConvPReLU(c, 3, dtype=self.dtype, name="conv1")(x)
        side = ConvPReLU(s, 3, dtype=self.dtype, name="conv2")(out[..., -s:])
        out = ConvPReLU(c, 3, dtype=self.dtype, name="conv3")(
            jnp.concatenate([out[..., :-s], side], axis=-1)
        )
        side = ConvPReLU(s, 3, dtype=self.dtype, name="conv4")(out[..., -s:])
        out = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv5")(
            jnp.concatenate([out[..., :-s], side], axis=-1)
        )
        return PReLU(name="prelu")(x + out)


def _instance_norm(x: Array) -> Array:
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class FeatResBlock(nn.Module):
    """feat_enc.py ResidualBlock (instance norm variant)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(_instance_norm(h))
        h = nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(h)
        h = jax.nn.relu(_instance_norm(h))
        if self.stride != 1 or x.shape[-1] != self.features:
            # reference downsample = Sequential(conv1x1, InstanceNorm2d)
            # (feat_enc.py:100-104) — the norm applies to the shortcut too
            x = _instance_norm(nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                dtype=self.dtype, param_dtype=jnp.float32,
                name="downsample")(x))
        return jax.nn.relu(x + h)


class LargeEncoder(nn.Module):
    """feat_enc.py:267-345: 1/8-res 128-dim correlation features."""

    output_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        h = jax.nn.relu(_instance_norm(h))
        for i, (dim, stride) in enumerate(
            [(64, 1), (112, 2), (160, 2), (160, 1)]
        ):
            h = FeatResBlock(dim, stride, self.dtype, name=f"layer{i}_0")(h)
            h = FeatResBlock(dim, 1, self.dtype, name=f"layer{i}_1")(h)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv2")(h)


class IFREncoder(nn.Module):
    """ifrnet.py Encoder: 4-level strided pyramid."""

    channels: Sequence[int]
    large: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        fs = []
        for idx, ch in enumerate(self.channels):
            k = 7 if self.large and idx == 0 else 3
            x = ConvPReLU(ch, k, 2, self.dtype, name=f"pyr{idx}_0")(x)
            x = ConvPReLU(ch, 3, 1, self.dtype, name=f"pyr{idx}_1")(x)
            fs.append(x)
        return fs


# ---------------------------------------------------------------------------
# Bidirectional correlation pyramid (raft.py:147-216)
# ---------------------------------------------------------------------------


class BidirCorr:
    def __init__(self, fmap0: Array, fmap1: Array, num_levels=4, radius=3):
        self.num_levels = num_levels
        self.radius = radius
        b, h, w, d = fmap0.shape
        f0 = fmap0.reshape(b, h * w, d).astype(jnp.float32)
        f1 = fmap1.reshape(b, h * w, d).astype(jnp.float32)
        corr = jnp.einsum("bnd,bmd->bnm", f0, f1) / np.sqrt(d)
        # pyramid over the *target* dims, stored as (B·N, h', w', 1)
        self.pyr = []
        self.pyr_t = []
        c = corr.reshape(b * h * w, h, w, 1)
        ct = corr.transpose(0, 2, 1).reshape(b * h * w, h, w, 1)
        for _ in range(num_levels):
            self.pyr.append(c)
            self.pyr_t.append(ct)
            c = nn.avg_pool(c, (2, 2), (2, 2))
            ct = nn.avg_pool(ct, (2, 2), (2, 2))
        self.shape = (b, h, w)

    def lookup(self, coords0: Array, coords1: Array):
        """coords*: (B, H, W, 2) pixel coords. Returns (corr, corr_T), each
        (B, H, W, levels·(2r+1)²)."""
        b, h, w = self.shape
        r = self.radius
        n = 2 * r + 1
        dy, dx = np.meshgrid(
            np.linspace(-r, r, n), np.linspace(-r, r, n), indexing="ij"
        )
        # RAFT adds its (dy, dx)-ordered window to (x, y)-ordered centroids
        # (raft.py:180-186), so the X offset varies along the window's FIRST
        # axis — reproduce that pairing or every off-centre tap transposes
        delta = jnp.asarray(
            np.stack([dy, dx], -1).reshape(1, n, n, 2), jnp.float32
        )

        def one_dir(pyr, coords):
            outs = []
            cc = coords.reshape(b * h * w, 1, 1, 2)
            for i, cp in enumerate(pyr):
                ch_, cw_ = cp.shape[1], cp.shape[2]
                pts = cc / (2**i) + delta  # (B·N, n, n, 2)
                if ch_ <= 1 or cw_ <= 1:
                    samp = jnp.broadcast_to(
                        cp[:, :1, :1, :], (cp.shape[0], n, n, 1)
                    )
                else:
                    gx = 2 * pts[..., 0] / (cw_ - 1) - 1
                    gy = 2 * pts[..., 1] / (ch_ - 1) - 1
                    samp = grid_sample(
                        cp, jnp.stack([gx, gy], -1), align_corners=True
                    )
                outs.append(samp.reshape(b, h, w, n * n))
            return jnp.concatenate(outs, axis=-1)

        return one_dir(self.pyr, coords0), one_dir(self.pyr_t, coords1)


# ---------------------------------------------------------------------------
# Decoders & update blocks
# ---------------------------------------------------------------------------


class InitDecoder(nn.Module):
    out_ch: int
    skip_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, f0, f1, embt):
        b, h, w, c = f0.shape
        e = jnp.broadcast_to(embt.reshape(b, 1, 1, 1), (b, h, w, 1)).astype(f0.dtype)
        x = jnp.concatenate([f0, f1, e], axis=-1)
        x = ConvPReLU(2 * c, 3, dtype=self.dtype, name="conv_in")(x)
        x = IFRResBlock(self.skip_ch, self.dtype, name="res")(x)
        x = UpConv(self.out_ch + 4, self.dtype, name="up")(x)
        return x[..., :2], x[..., 2:4], x[..., 4:]


class IntermediateDecoder(nn.Module):
    out_ch: int
    skip_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ft, f0, f1, flow0, flow1):
        c = f0.shape[-1]
        x = jnp.concatenate(
            [ft, _warp(f0, flow0), _warp(f1, flow1), flow0, flow1], axis=-1
        )
        x = ConvPReLU(3 * c, 3, dtype=self.dtype, name="conv_in")(x)
        x = IFRResBlock(self.skip_ch, self.dtype, name="res")(x)
        x = UpConv(self.out_ch + 4, self.dtype, name="up")(x)
        nf0 = x[..., :2] + 2.0 * _resize2(flow0, 2.0)
        nf1 = x[..., 2:4] + 2.0 * _resize2(flow1, 2.0)
        return nf0, nf1, x[..., 4:]


class MultiFlowDecoder(nn.Module):
    skip_ch: int
    num_flows: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ft, f0, f1, flow0, flow1):
        c = f0.shape[-1]
        n = self.num_flows
        x = jnp.concatenate(
            [ft, _warp(f0, flow0), _warp(f1, flow1), flow0, flow1], axis=-1
        )
        x = ConvPReLU(3 * c, 3, dtype=self.dtype, name="conv_in")(x)
        x = IFRResBlock(self.skip_ch, self.dtype, name="res")(x)
        x = UpConv(8 * n, self.dtype, name="up")(x)
        d0, d1, mask, img_res = jnp.split(
            x, [2 * n, 4 * n, 5 * n], axis=-1
        )
        mask = jax.nn.sigmoid(mask)
        f0u = jnp.tile(2.0 * _resize2(flow0, 2.0), (1, 1, 1, n))
        f1u = jnp.tile(2.0 * _resize2(flow1, 2.0), (1, 1, 1, n))
        return d0 + f0u, d1 + f1u, mask, img_res


class BasicUpdateBlock(nn.Module):
    """raft.py:92-143."""

    cdim: int
    hidden_dim: int = 192
    flow_dim: int = 64
    corr_dim: int = 256
    corr_dim2: int = 192
    fc_dim: int = 188
    scale_factor: float | None = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, flow, corr):
        lrelu = lambda v: jnp.where(v >= 0, v, 0.1 * v)
        sf = self.scale_factor
        if sf is not None:
            net = _resize2(net, 1 / sf)
        conv = lambda f, k, nme: nn.Conv(
            f, (k, k), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name=nme,
        )
        cor = lrelu(conv(self.corr_dim, 1, "convc1")(corr))
        cor = lrelu(conv(self.corr_dim2, 3, "convc2")(cor))
        flo = lrelu(conv(self.flow_dim * 2, 7, "convf1")(flow))
        flo = lrelu(conv(self.flow_dim, 3, "convf2")(flo))
        inp = lrelu(conv(self.fc_dim, 3, "conv")(jnp.concatenate([cor, flo], -1)))
        inp = jnp.concatenate([inp, flow, net], axis=-1)
        out = conv(self.hidden_dim, 3, "gru1")(inp)
        out = conv(self.hidden_dim, 3, "gru2")(lrelu(out))
        dn = conv(self.hidden_dim, 3, "feat1")(out)
        dn = conv(self.cdim, 3, "feat2")(lrelu(dn))
        df = conv(self.hidden_dim, 3, "flow1")(out)
        df = conv(4, 3, "flow2")(lrelu(df))
        if sf is not None:
            dn = _resize2(dn, sf)
            df = sf * _resize2(df, sf)
        return dn, df


@register_model("amt")
class AMT(nn.Module):
    """Single-t interpolation core (amt.py:113-225 _forward). Call
    :func:`interpolate` for the multi-frame driver."""

    corr_radius: int = 3
    corr_lvls: int = 4
    num_flows: int = 5
    channels: Sequence[int] = (84, 96, 112, 128)
    skip_channels: int = 84
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img0: Array, img1: Array, embt: Array) -> Array:
        """img0/img1 (B, H, W, 3) in [0, 1]; embt (B,) in (0, 1)."""
        ch = self.channels
        mean_ = jnp.concatenate([img0, img1], axis=2).mean(
            axis=(1, 2, 3), keepdims=True
        )
        img0 = img0 - mean_
        img1 = img1 - mean_
        b, h, w, _ = img0.shape

        enc = LargeEncoder(128, self.dtype, name="feat_encoder")
        fmap0 = enc(img0)
        fmap1 = enc(img1)
        # features at 1/8: LargeEncoder strides 2·2·2
        corr_fn = BidirCorr(fmap0, fmap1, self.corr_lvls, self.corr_radius)
        gy, gx = jnp.meshgrid(
            jnp.arange(h // 8, dtype=jnp.float32),
            jnp.arange(w // 8, dtype=jnp.float32),
            indexing="ij",
        )
        coord = jnp.broadcast_to(
            jnp.stack([gx, gy], -1)[None], (b, h // 8, w // 8, 2)
        )

        pyr_enc = IFREncoder(ch, large=True, dtype=self.dtype, name="encoder")
        f0_1, f0_2, f0_3, f0_4 = pyr_enc(img0)
        f1_1, f1_2, f1_3, f1_4 = pyr_enc(img1)

        def corr_lookup(flow0, flow1, downsample):
            t1s = 1.0 / embt.reshape(b, 1, 1, 1)
            t0s = 1.0 / (1.0 - embt.reshape(b, 1, 1, 1))
            if downsample != 1:
                inv = 1.0 / downsample
                flow0 = inv * _resize2(flow0, inv)
                flow1 = inv * _resize2(flow1, inv)
            c0, c1 = corr_fn.lookup(coord + flow1 * t1s, coord + flow0 * t0s)
            return (
                jnp.concatenate([c0, c1], -1),
                jnp.concatenate([flow0, flow1], -1),
            )

        # decoder 4 (1/16 → 1/8)
        up_f0_4, up_f1_4, ft_3 = InitDecoder(
            ch[2], self.skip_channels, self.dtype, name="decoder4"
        )(f0_4, f1_4, embt)
        corr4, flow4 = corr_lookup(up_f0_4, up_f1_4, 1)
        dft, dfl = BasicUpdateBlock(ch[2], dtype=self.dtype, name="update4")(
            ft_3, flow4, corr4
        )
        up_f0_4 += dfl[..., :2]
        up_f1_4 += dfl[..., 2:]
        ft_3 += dft

        # decoder 3 (1/8 → 1/4)
        up_f0_3, up_f1_3, ft_2 = IntermediateDecoder(
            ch[1], self.skip_channels, self.dtype, name="decoder3"
        )(ft_3, f0_3, f1_3, up_f0_4, up_f1_4)
        corr3, flow3 = corr_lookup(up_f0_3, up_f1_3, 2)
        dft, dfl = BasicUpdateBlock(
            ch[1], scale_factor=2.0, dtype=self.dtype, name="update3_low"
        )(ft_2, flow3, corr3)
        up_f0_3 += dfl[..., :2]
        up_f1_3 += dfl[..., 2:]
        ft_2 += dft
        corr3u = _resize2(corr3, 2.0)
        dft, dfl = BasicUpdateBlock(ch[1], dtype=self.dtype, name="update3_high")(
            ft_2, jnp.concatenate([up_f0_3, up_f1_3], -1), corr3u
        )
        ft_2 += dft
        up_f0_3 += dfl[..., :2]
        up_f1_3 += dfl[..., 2:]

        # decoder 2 (1/4 → 1/2)
        up_f0_2, up_f1_2, ft_1 = IntermediateDecoder(
            ch[0], self.skip_channels, self.dtype, name="decoder2"
        )(ft_2, f0_2, f1_2, up_f0_3, up_f1_3)
        corr2, flow2 = corr_lookup(up_f0_2, up_f1_2, 4)
        dft, dfl = BasicUpdateBlock(
            ch[0], scale_factor=4.0, dtype=self.dtype, name="update2_low"
        )(ft_1, flow2, corr2)
        up_f0_2 += dfl[..., :2]
        up_f1_2 += dfl[..., 2:]
        ft_1 += dft
        corr2u = _resize2(corr2, 4.0)
        dft, dfl = BasicUpdateBlock(ch[0], dtype=self.dtype, name="update2_high")(
            ft_1, jnp.concatenate([up_f0_2, up_f1_2], -1), corr2u
        )
        ft_1 += dft
        up_f0_2 += dfl[..., :2]
        up_f1_2 += dfl[..., 2:]

        # decoder 1 (1/2 → 1), multi-flow
        up_f0_1, up_f1_1, mask, img_res = MultiFlowDecoder(
            self.skip_channels, self.num_flows, self.dtype, name="decoder1"
        )(ft_1, f0_1, f1_1, up_f0_2, up_f1_2)

        # multi-flow combination (multi_flow.py:12-56)
        n = self.num_flows
        bhwc = (b * n, h, w)
        f0n = up_f0_1.reshape(b, h, w, n, 2).transpose(0, 3, 1, 2, 4).reshape(
            b * n, h, w, 2
        )
        f1n = up_f1_1.reshape(b, h, w, n, 2).transpose(0, 3, 1, 2, 4).reshape(
            b * n, h, w, 2
        )
        mkn = mask.reshape(b, h, w, n, 1).transpose(0, 3, 1, 2, 4).reshape(
            b * n, h, w, 1
        )
        irn = img_res.reshape(b, h, w, n, 3).transpose(0, 3, 1, 2, 4).reshape(
            b * n, h, w, 3
        )
        i0n = jnp.tile(img0[:, None], (1, n, 1, 1, 1)).reshape(b * n, h, w, 3)
        i1n = jnp.tile(img1[:, None], (1, n, 1, 1, 1)).reshape(b * n, h, w, 3)
        mn = jnp.tile(mean_[:, None], (1, n, 1, 1, 1)).reshape(b * n, 1, 1, 1)
        warps = mkn * _warp(i0n, f0n) + (1 - mkn) * _warp(i1n, f1n) + mn + irn
        warps = warps.reshape(b, n, h, w, 3)
        comb_in = warps.transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * 3)
        comb = ConvPReLU(6 * n, 7, dtype=self.dtype, name="comb0")(comb_in)
        comb = nn.Conv(3, (7, 7), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="comb1")(comb)
        pred = warps.mean(axis=1) + comb
        return jnp.clip(pred, 0, 1)


def interpolate(model: AMT, params, frame0: Array, frame1: Array, factor: int):
    """Multi-frame driver (amt.py:227-236): frames in [-1, 1], 16-divisible
    padding, returns (B, factor-1, H, W, 3) in [-1, 1]."""
    i0 = (frame0 + 1) / 2
    i1 = (frame1 + 1) / 2
    b, h, w, _ = i0.shape
    ph = (-h) % 16
    pw = (-w) % 16
    pad = ((0, 0), (ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2), (0, 0))
    i0p = jnp.pad(i0, pad, mode="edge")
    i1p = jnp.pad(i1, pad, mode="edge")
    outs = []
    for i in range(1, factor):
        embt = jnp.full((b,), i / factor, jnp.float32)
        pred = model.apply(params, i0p, i1p, embt)
        pred = pred[:, pad[1][0] : pad[1][0] + h, pad[2][0] : pad[2][0] + w]
        outs.append(pred)
    return jnp.stack(outs, axis=1) * 2 - 1
