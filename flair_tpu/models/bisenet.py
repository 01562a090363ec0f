"""BiSeNet face parser — alternative to ParseNet
(re-design of facelib/parsing/bisenet.py:8-141 + resnet.py ResNet18; also
covers the duplicate top-level copy guided_diffusion/bisenet.py:15-294).

Context path over a ResNet18 backbone with attention-refinement modules,
feature-fusion module, three output heads bilinearly upsampled to input size.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_matrix
from .registry import register_model
from .resnet import resnet18

Array = jax.Array


def _bilinear_up_align(x: Array, out_hw) -> Array:
    """F.interpolate(..., mode='bilinear', align_corners=True)."""
    import numpy as np

    h_in, w_in = x.shape[1], x.shape[2]
    h, w = out_hw

    def mat(o, i):
        m = np.zeros((o, i), np.float32)
        if o == 1:
            m[0, 0] = 1
            return m
        for k in range(o):
            p = k * (i - 1) / (o - 1)
            p0 = int(np.floor(p))
            f = p - p0
            m[k, p0] += 1 - f
            m[k, min(p0 + 1, i - 1)] += f
        return m

    ry = jnp.asarray(mat(h, h_in), x.dtype)
    rx = jnp.asarray(mat(w, w_in), x.dtype)
    y = jnp.einsum("uh,bhwc->buwc", ry, x)
    return jnp.einsum("vw,bhwc->bhvc", rx, y)


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, param_dtype=jnp.float32,
                         name="bn")(x)
        return jax.nn.relu(x)


class AttentionRefinement(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.features, 3, self.dtype, name="conv")(x)
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=True,
                             param_dtype=jnp.float32, name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class FeatureFusion(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fsp, fcp):
        feat = ConvBNReLU(self.features, 1, self.dtype, name="convblk")(
            jnp.concatenate([fsp, fcp], axis=-1)
        )
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.features // 4, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv1")(atten)
        atten = jax.nn.relu(atten)
        atten = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiSeNetOutput(nn.Module):
    mid: int
    num_class: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = ConvBNReLU(self.mid, 3, self.dtype, name="conv")(x)
        out = nn.Conv(self.num_class, (1, 1), use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv_out")(feat)
        return out, feat


@register_model("bisenet")
class BiSeNet(nn.Module):
    """(B, H, W, 3) → 3 per-pixel class-logit maps at input resolution."""

    num_class: int = 19
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        feats = resnet18(self.dtype).copy(name="resnet")(x)
        feat8, feat16, feat32 = feats[1], feats[2], feats[3]

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, 1, self.dtype, name="conv_avg")(avg)
        avg_up = jnp.broadcast_to(
            avg, (feat32.shape[0], feat32.shape[1], feat32.shape[2], 128)
        )

        f32 = AttentionRefinement(128, self.dtype, name="arm32")(feat32) + avg_up
        f32_up = jnp.repeat(jnp.repeat(f32, 2, 1), 2, 2)[
            :, : feat16.shape[1], : feat16.shape[2]
        ]
        f32_up = ConvBNReLU(128, 3, self.dtype, name="conv_head32")(f32_up)

        f16 = AttentionRefinement(128, self.dtype, name="arm16")(feat16) + f32_up
        f16_up = jnp.repeat(jnp.repeat(f16, 2, 1), 2, 2)[
            :, : feat8.shape[1], : feat8.shape[2]
        ]
        f16_up = ConvBNReLU(128, 3, self.dtype, name="conv_head16")(f16_up)

        fuse = FeatureFusion(256, self.dtype, name="ffm")(feat8, f16_up)
        out, _ = BiSeNetOutput(256, self.num_class, self.dtype, name="conv_out")(fuse)
        out16, _ = BiSeNetOutput(64, self.num_class, self.dtype,
                                 name="conv_out16")(f16_up)
        out32, _ = BiSeNetOutput(64, self.num_class, self.dtype,
                                 name="conv_out32")(f32_up)
        return (
            _bilinear_up_align(out, (h, w)),
            _bilinear_up_align(out16, (h, w)),
            _bilinear_up_align(out32, (h, w)),
        )
