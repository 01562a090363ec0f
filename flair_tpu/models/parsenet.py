"""ParseNet face parser (re-design of facelib/parsing/parsenet.py:1-194).

19-class face parsing at 512²; returns (mask_logits, img). Used by the face
paste-back to build the soft blend mask (face_restoration_helper.py:264-321).
BatchNorm runs in inference mode with stored running statistics (the
``batch_stats`` collection, filled by the torch converter).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .registry import register_model

Array = jax.Array


class PNConv(nn.Module):
    """ConvLayer: [nearest-up] → reflect pad → conv → [BN] → [act]
    (parsenet.py:75-110)."""

    out_channels: int
    kernel_size: int = 3
    scale: str = "none"  # none | down | up
    norm: bool = False
    relu_type: str = "none"  # none | relu | leakyrelu | prelu
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.scale == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        p = int(np.ceil((self.kernel_size - 1.0) / 2))
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        stride = 2 if self.scale == "down" else 1
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(stride, stride),
            padding="VALID",
            use_bias=not self.norm,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv",
        )(x)
        if self.norm:
            x = nn.BatchNorm(
                use_running_average=True, param_dtype=jnp.float32, name="bn"
            )(x)
        if self.relu_type == "relu":
            x = jax.nn.relu(x)
        elif self.relu_type == "leakyrelu":
            x = jnp.where(x >= 0, x, 0.2 * x)
        elif self.relu_type == "prelu":
            a = self.param(
                "prelu", nn.initializers.constant(0.25),
                (self.out_channels,), jnp.float32,
            )
            x = jnp.where(x >= 0, x, a * x)
        return x


class PNResidualBlock(nn.Module):
    """Residual block with optional up/down scaling (parsenet.py:113-135)."""

    out_channels: int
    scale: str = "none"
    relu_type: str = "leakyrelu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c_in = x.shape[-1]
        if self.scale == "none" and c_in == self.out_channels:
            identity = x
        else:
            identity = PNConv(
                self.out_channels, 3, self.scale, dtype=self.dtype, name="shortcut"
            )(x)
        conf = {"down": ("none", "down"), "up": ("up", "none"),
                "none": ("none", "none")}[self.scale]
        h = PNConv(
            self.out_channels, 3, conf[0], norm=True,
            relu_type=self.relu_type, dtype=self.dtype, name="conv1",
        )(x)
        h = PNConv(
            self.out_channels, 3, conf[1], norm=True,
            relu_type="none", dtype=self.dtype, name="conv2",
        )(h)
        return identity + h


@register_model("parsenet")
class ParseNet(nn.Module):
    """Encoder–body–decoder parser (parsenet.py:140-194).

    Input (B, H, W, 3) normalised to [-1, 1]; returns
    (mask_logits (B, H, W, 19), out_img (B, H, W, 3)).
    """

    in_size: int = 512
    out_size: int = 512
    min_feat_size: int = 32
    base_ch: int = 64
    parsing_ch: int = 19
    res_depth: int = 10
    relu_type: str = "leakyrelu"
    ch_range: Sequence[int] = (32, 256)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array):
        min_ch, max_ch = self.ch_range
        clip = lambda c: max(min_ch, min(c, max_ch))
        mfs = min(self.in_size, self.min_feat_size)
        down_steps = int(np.log2(self.in_size // mfs))
        up_steps = int(np.log2(self.out_size // mfs))

        h = PNConv(self.base_ch, 3, dtype=self.dtype, name="enc_in")(x)
        ch = self.base_ch
        for i in range(down_steps):
            h = PNResidualBlock(
                clip(ch * 2), "down", self.relu_type, self.dtype,
                name=f"enc_{i}",
            )(h)
            ch *= 2
        feat = h
        for i in range(self.res_depth):
            h = PNResidualBlock(
                clip(ch), "none", self.relu_type, self.dtype, name=f"body_{i}"
            )(h)
        h = feat + h
        for i in range(up_steps):
            h = PNResidualBlock(
                clip(ch // 2), "up", self.relu_type, self.dtype,
                name=f"dec_{i}",
            )(h)
            ch //= 2
        out_img = PNConv(3, 3, dtype=self.dtype, name="out_img_conv")(h)
        out_mask = PNConv(
            self.parsing_ch, 3, dtype=self.dtype, name="out_mask_conv"
        )(h)
        return out_mask, out_img
