"""DAVSRNet — deep-unfolding space-time super-resolution
(re-design of davsr.py:712-1921).

Alternates an FFT-domain data-consistency prox over the 3-D (T, H, W) volume
(``DataNet3D``, davsr.py:1688-1720; ``p2o``/``ps2ot`` PSF→OTF helpers,
davsr.py:1557-1608) with a BasicVSR++ image-space regularizer, plus a
hyper-parameter net (``HyPaNet``, davsr.py:1722-1744) and built-in
SuperSloMo temporal interpolation for the initial estimate
(davsr.py:1790-1833). The hard-coded ×4 blur kernel (davsr.py:25 ker_x4)
ships as an npz asset.

Convention: videos (B, T, H, W, C); the FFT volume math runs in f32 complex.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .registry import register_model
from .spynet import SPyNet
from .superslomo import SSUNet, _back_warp
from .vsrpp import BasicVSRPP, ResidualBlocksWithInputConv

Array = jax.Array

_ASSET = os.path.join(
    os.path.dirname(os.path.dirname(__file__)), "assets", "blur_kernels.npz"
)


def load_ker_x4() -> np.ndarray:
    return np.asarray(np.load(_ASSET)["ker_x4"], np.float64)


def ps2ot(psf: np.ndarray, shape) -> np.ndarray:
    """3-D PSF → OTF on host (davsr.py:1582-1608): zero-pad to the full
    volume, roll each axis by -size/2, FFT. psf (t, h, w); shape (T, H, W)."""
    otf = np.zeros(shape, np.float64)
    otf[: psf.shape[0], : psf.shape[1], : psf.shape[2]] = psf
    for axis, n in enumerate(psf.shape):
        otf = np.roll(otf, -int(n / 2), axis=axis)
    return np.fft.fftn(otf)


def upsample3d(x: Array, sf) -> Array:
    """Zero-stuffing (T, H, W) upsample (davsr.py:1609-1621).
    x (B, T, H, W, C) → (B, T·s0, H·s1, W·s2, C)."""
    b, t, h, w, c = x.shape
    z = jnp.zeros((b, t * sf[0], h * sf[1], w * sf[2], c), x.dtype)
    return z.at[:, :: sf[0], :: sf[1], :: sf[2], :].set(x)


def data_prox_3d(x: Array, FB, FBC, F2B, FBFy, alpha, sf) -> Array:
    """FFT data-consistency prox (DataNet3D, davsr.py:1688-1713).

    All F* volumes are (T, H, W) (complex for FB/FBC/FBFy per channel);
    x (B, T, H, W, C). alpha: (B, 1, 1, 1, 1).
    """
    xt = jnp.moveaxis(x, -1, 1).astype(jnp.complex64)  # (B, C, T, H, W)
    FR = FBFy + jnp.fft.fftn(alpha * xt, axes=(2, 3, 4))
    x1 = FB * FR
    b, c, T, H, W = x1.shape
    s0, s1, s2 = sf
    blocks = x1.reshape(b, c, s0, T // s0, s1, H // s1, s2, W // s2)
    FBR = blocks.mean(axis=(2, 4, 6))
    invW = (
        F2B.reshape(s0, T // s0, s1, H // s1, s2, W // s2)
        .mean(axis=(0, 2, 4))
        .real
    )
    invWBR = FBR / (invW + alpha)
    FCBinvWBR = FBC * jnp.tile(invWBR, (1, 1, s0, s1, s2))
    FX = (FR - FCBinvWBR) / alpha
    xest = jnp.real(jnp.fft.ifftn(FX, axes=(2, 3, 4)))
    return jnp.moveaxis(xest, 1, -1).astype(x.dtype)


class HyPaNet(nn.Module):
    """1x1-conv MLP → softplus hyper-parameters (davsr.py:1722-1744)."""

    out_nc: int = 16
    channel: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.channel, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(x)
        h = jax.nn.relu(h)
        h = nn.Dense(self.channel, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        h = jax.nn.relu(h)
        h = nn.Dense(self.out_nc, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc3")(h)
        return jax.nn.softplus(h) + 1e-6


class ImageVSRPP(nn.Module):
    """Image-space BasicVSR++ regularizer (davsr.py:1081-1537 semantics:
    feature extraction → bidirectional second-order propagation →
    reconstruction back to RGB with global residual)."""

    mid_channels: int = 64
    num_blocks: int = 5
    deform_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        feat = ResidualBlocksWithInputConv(
            self.mid_channels, self.num_blocks, self.dtype, name="feat_extract"
        )(x.reshape(b * t, h, w, c)).reshape(b, t, h, w, self.mid_channels)

        spynet = SPyNet(name="spynet")
        lq01 = jnp.clip(x, 0, 1)
        l1 = lq01[:, :-1].reshape(b * (t - 1), h, w, c)
        l2 = lq01[:, 1:].reshape(b * (t - 1), h, w, c)
        fwd = spynet(l2, l1).reshape(b, t - 1, h, w, 2)
        bwd = spynet(l1, l2).reshape(b, t - 1, h, w, 2)

        feat = BasicVSRPP(
            self.mid_channels, deform_groups=self.deform_groups,
            dtype=self.dtype, name="vsrpp",
        )(feat, fwd, bwd)
        out = ResidualBlocksWithInputConv(
            self.mid_channels, 1, self.dtype, name="recon"
        )(feat.reshape(b * t, h, w, self.mid_channels))
        out = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                      param_dtype=jnp.float32, name="conv_out")(out)
        return x + out.reshape(b, t, h, w, c)


_SLOMO_MEAN = jnp.array([0.429, 0.431, 0.397])


@register_model("davsr")
class DAVSRNet(nn.Module):
    """Deep-unfolding space-time SR (davsr.py:1746-1921).

    ``__call__(x)`` with x (B, T, H, W, 3) in [0, 1]; returns
    (B, T·sf0, H·sf1, W·sf2, 3).
    """

    n_iter: int = 4
    h_nc: int = 64
    mid_channels: int = 64
    num_blocks: int = 5
    sf: Sequence[int] = (5, 4, 4)
    deform_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, return_after_first_prox: bool = False):
        """``return_after_first_prox``: stop after the first data-consistency
        prox (before the VSR++ regularizer) — the longest assembled prefix
        that admits converted-weight parity with the reference, whose OWN
        forward breaks at the second unfolding iteration (its regularizer
        upsamples 4× against fixed-size OTFs, davsr.py:1914-1916 vs
        :1374-1380; proven by tests/test_davsr_yolo.py)."""
        b, t, h, w, c = x.shape
        s0, s1, s2 = self.sf
        T, H, W = t * s0, h * s1, w * s2

        # host-precomputed OTFs for the fixed ×4 kernel replicated over 5
        # frames (davsr.py:1848-1856). Kept as NUMPY constants: eager complex
        # device arrays cannot be embedded as MLIR constants on some TPU
        # runtimes, numpy constants always can.
        k2d = load_ker_x4()
        psf = np.repeat(k2d[None], s0, axis=0) / s0
        FB_np = ps2ot(psf, (T, H, W))
        FB = FB_np.astype(np.complex64)
        FBC = np.conj(FB)
        F2B = (np.abs(FB_np) ** 2).astype(np.complex64)

        STy = upsample3d(x, self.sf)
        FBFy = FBC * jnp.fft.fftn(
            jnp.moveaxis(STy, -1, 1).astype(jnp.complex64), axes=(2, 3, 4)
        )

        # temporal interpolation init (SuperSloMo UNets, davsr.py:1788-1833)
        mean = _SLOMO_MEAN.astype(x.dtype)
        x0 = x - mean
        f0 = x0[:, :-1].reshape(b * (t - 1), h, w, c)
        f1 = x0[:, 1:].reshape(b * (t - 1), h, w, c)
        flow_net = SSUNet(4, self.dtype, name="flow")
        interp_net = SSUNet(5, self.dtype, name="interp")
        flow_out = flow_net(jnp.concatenate([f0, f1], axis=-1))
        f01, f10 = flow_out[..., :2], flow_out[..., 2:]
        inters = []
        for i in range(1, s0):
            tt = i / s0
            temp = -tt * (1 - tt)
            ft0 = temp * f01 + tt * tt * f10
            ft1 = (1 - tt) ** 2 * f01 + temp * f10
            g0 = _back_warp(f0, ft0)
            g1 = _back_warp(f1, ft1)
            io = interp_net(
                jnp.concatenate([f0, f1, f01, f10, ft1, ft0, g1, g0], -1)
            )
            ft0f = io[..., :2] + ft0
            ft1f = io[..., 2:4] + ft1
            vt0 = jax.nn.sigmoid(io[..., 4:5])
            vt1 = 1 - vt0
            ft_p = ((1 - tt) * vt0 * _back_warp(f0, ft0f)
                    + tt * vt1 * _back_warp(f1, ft1f)) / (
                (1 - tt) * vt0 + tt * vt1
            )
            inters.append(ft_p + mean)
        x_inter = jnp.stack(inters, axis=1).reshape(b, t - 1, s0 - 1, h, w, c)

        # assemble the T·s0-frame init: replicate-pads at the ends plus the
        # per-gap interpolations (davsr.py:1874-1890 hard-codes 2+2 pads for
        # s0=5; generalised here to s0−1 total pads)
        pre_pad = (s0 - 1) // 2
        post_pad = (s0 - 1) - pre_pad
        frames = []
        if pre_pad:
            frames.append(jnp.repeat(x[:, :1], pre_pad, axis=1))
        for i in range(t - 1):
            frames.append(x[:, i : i + 1])
            frames.append(x_inter[:, i])
        frames.append(x[:, t - 1 :])
        if post_pad:
            frames.append(jnp.repeat(x[:, -1:], post_pad, axis=1))
        xt = jnp.concatenate(frames, axis=1)  # (B, t·s0, h, w, C)

        # bilinear align_corners=True spatial upsample (davsr.py:1891-1897)
        def up_mat(o, i):
            m = np.zeros((o, i), np.float32)
            for kk in range(o):
                p = kk * (i - 1) / (o - 1) if o > 1 else 0.0
                p0 = int(np.floor(p))
                f = p - p0
                m[kk, p0] += 1 - f
                m[kk, min(p0 + 1, i - 1)] += f
            return m

        ry = jnp.asarray(up_mat(H, h), xt.dtype)
        rx = jnp.asarray(up_mat(W, w), xt.dtype)
        xt = jnp.einsum("uh,bthwc->btuwc", ry, xt)
        xt = jnp.einsum("vw,bthwc->bthvc", rx, xt)

        ab = HyPaNet(self.n_iter * 2, self.h_nc, name="hypanet")(
            jnp.asarray([[0.0, float(s0), float(s1)]], jnp.float32)
        )  # (1, 2·n_iter)

        if return_after_first_prox:
            alpha = ab[0, 0].astype(jnp.complex64).reshape(1, 1, 1, 1, 1)
            return data_prox_3d(xt, FB, FBC, F2B, FBFy, alpha, self.sf)

        # ONE shared VSR++ regularizer across unfolding iterations
        # (davsr.py:1763-1772: self.vsr reused in the loop at :1914-1916)
        vsr = ImageVSRPP(
            self.mid_channels, self.num_blocks, self.deform_groups,
            self.dtype, name="vsr",
        )
        xcur = xt
        for i in range(self.n_iter):
            alpha = ab[0, i].astype(jnp.complex64).reshape(1, 1, 1, 1, 1)
            xcur = data_prox_3d(xcur, FB, FBC, F2B, FBFy, alpha, self.sf)
            xcur = vsr(xcur)
        return xcur
