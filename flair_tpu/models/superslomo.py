"""SuperSloMo frame interpolator (re-design of superslomo.py:8-291).

Two UNets: a flow estimator (6→4: bidirectional flows) and an interpolation
UNet (20→5: flow residues + visibility), with backward warping between. Used
by the training path to temporally upsample decimated clips
(restore_util.py:6, train_util.py:18).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.warp import grid_sample
from .common import leaky_relu
from .registry import register_model

Array = jax.Array

_MEAN = jnp.array([0.429, 0.431, 0.397])


class SSDown(nn.Module):
    """avg-pool 2x → two conv+LReLU (superslomo.py:8-80)."""

    features: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.avg_pool(x, (2, 2), (2, 2))
        k = self.kernel
        x = leaky_relu(nn.Conv(self.features, (k, k), padding="SAME",
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="conv1")(x), 0.1)
        return leaky_relu(nn.Conv(self.features, (k, k), padding="SAME",
                                  dtype=self.dtype, param_dtype=jnp.float32,
                                  name="conv2")(x), 0.1)


class SSUp(nn.Module):
    """bilinear 2x → conv → concat skip → conv (superslomo.py:82-144)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        from ..ops.resize import resize_bilinear

        x = resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = leaky_relu(nn.Conv(self.features, (3, 3), padding="SAME",
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name="conv1")(x), 0.1)
        x = jnp.concatenate([x, skip], axis=-1)
        return leaky_relu(nn.Conv(self.features, (3, 3), padding="SAME",
                                  dtype=self.dtype, param_dtype=jnp.float32,
                                  name="conv2")(x), 0.1)


class SSUNet(nn.Module):
    """6-level UNet (superslomo.py:146-215)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, n: nn.Conv(f, (k, k), padding="SAME",
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name=n)
        x = leaky_relu(c(32, 7, "conv1")(x), 0.1)
        s1 = leaky_relu(c(32, 7, "conv2")(x), 0.1)
        s2 = SSDown(64, 5, self.dtype, name="down1")(s1)
        s3 = SSDown(128, 3, self.dtype, name="down2")(s2)
        s4 = SSDown(256, 3, self.dtype, name="down3")(s3)
        s5 = SSDown(512, 3, self.dtype, name="down4")(s4)
        x = SSDown(512, 3, self.dtype, name="down5")(s5)
        x = SSUp(512, self.dtype, name="up1")(x, s5)
        x = SSUp(256, self.dtype, name="up2")(x, s4)
        x = SSUp(128, self.dtype, name="up3")(x, s3)
        x = SSUp(64, self.dtype, name="up4")(x, s2)
        x = SSUp(32, self.dtype, name="up5")(x, s1)
        return leaky_relu(c(self.out_channels, 3, "conv3")(x), 0.1)


def _back_warp(img: Array, flow: Array) -> Array:
    """Backward warp with the reference's own grid normalisation
    (superslomo.py:225-247: x_norm = 2(x/W) − 1, default grid_sample)."""
    b, h, w, _ = img.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=flow.dtype), jnp.arange(w, dtype=flow.dtype),
        indexing="ij",
    )
    x = gx[None] + flow[..., 0]
    y = gy[None] + flow[..., 1]
    grid = jnp.stack([2 * (x / w - 0.5), 2 * (y / h - 0.5)], axis=-1)
    return grid_sample(img, grid, align_corners=False)


@register_model("superslomo")
class SuperSloMo(nn.Module):
    """frame0/frame1 (B, H, W, 3) in [-1, 1] → ``factor−1`` intermediate
    frames (B, factor−1, H, W, 3) (superslomo.py:249-291)."""

    factor: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frame0: Array, frame1: Array, return_flow: bool = False):
        mean = _MEAN.astype(frame0.dtype)
        i0 = (frame0 + 1) / 2 - mean
        i1 = (frame1 + 1) / 2 - mean

        flow_out = SSUNet(4, self.dtype, name="flow_estimator")(
            jnp.concatenate([i0, i1], axis=-1)
        )
        f01 = flow_out[..., :2]
        f10 = flow_out[..., 2:]

        interp_net = SSUNet(5, self.dtype, name="interp")
        frames = []
        for i in range(1, self.factor):
            t = i / self.factor
            temp = -t * (1 - t)
            ft0 = temp * f01 + (t * t) * f10
            ft1 = ((1 - t) * (1 - t)) * f01 + temp * f10
            g0 = _back_warp(i0, ft0)
            g1 = _back_warp(i1, ft1)
            io = interp_net(
                jnp.concatenate([i0, i1, f01, f10, ft1, ft0, g1, g0], axis=-1)
            )
            ft0f = io[..., :2] + ft0
            ft1f = io[..., 2:4] + ft1
            vt0 = jax.nn.sigmoid(io[..., 4:5])
            vt1 = 1 - vt0
            g0f = _back_warp(i0, ft0f)
            g1f = _back_warp(i1, ft1f)
            ft_p = ((1 - t) * vt0 * g0f + t * vt1 * g1f) / (
                (1 - t) * vt0 + t * vt1
            )
            frames.append((ft_p + mean) * 2 - 1)
        out = jnp.stack(frames, axis=1)
        if return_flow:
            return out, f01, f10
        return out
