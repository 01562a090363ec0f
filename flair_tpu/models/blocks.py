"""UNet building blocks: ADM-style ResBlock / attention, SR3-style ResnetBlock.

ADM blocks re-design unet_new.py:135-429 (ResBlock with optional
scale-shift-norm FiLM, up/down variants; AttentionBlock / AttentionbottleBlock
with QKVAttentionLegacy semantics). SR3 blocks re-design sr3.py:63-200
(FeatureWiseAffine noise conditioning, Block, ResnetBlock, SelfAttention).

All take (B, T, H, W, C) videos and (B, T, emb) embeddings.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import dot_product_attention, flash_attention
from .common import (
    Conv2d,
    Conv3d,
    Dense,
    Downsample2x,
    GroupNorm32,
    Upsample2x,
    fold_time,
    silu,
    unfold_time,
)

Array = jax.Array


class ResBlock(nn.Module):
    """ADM residual block (unet_new.py:233-330; unet.py variant adds a
    configurable 3-D kernel). dims=3 applies the convs over (T, H, W)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    dims: int = 2
    kernel_size: Sequence[int] | int = 3
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, emb: Array, deterministic: bool = True
    ) -> Array:
        c_in = x.shape[-1]
        c_out = self.out_channels

        def conv(name, zero=False):
            if self.dims == 3:
                ks = self.kernel_size
                if isinstance(ks, int):
                    ks = (ks, ks, ks)
                return Conv3d(c_out, ks, zero_init=zero, dtype=self.dtype, name=name)
            return Conv2d(c_out, 3, zero_init=zero, dtype=self.dtype, name=name)

        h = GroupNorm32(32, name="in_norm")(x)
        h = silu(h)
        if self.up:
            h = Upsample2x(c_in, use_conv=False, dtype=self.dtype)(h)
            x = Upsample2x(c_in, use_conv=False, dtype=self.dtype)(x)
        elif self.down:
            hb, b0 = fold_time(h)
            hb = nn.avg_pool(hb, (2, 2), (2, 2))
            h = unfold_time(hb, b0)
            xb, _ = fold_time(x)
            xb = nn.avg_pool(xb, (2, 2), (2, 2))
            x = unfold_time(xb, b0)
        h = conv("in_conv")(h)

        emb_out = Dense(
            2 * c_out if self.use_scale_shift_norm else c_out,
            dtype=self.dtype,
            name="emb_proj",
        )(silu(emb))
        emb_out = emb_out[:, :, None, None, :]  # (B, T, 1, 1, C')

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(32, name="out_norm")(h) * (1 + scale) + shift
            h = silu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = conv("out_conv", zero=True)(h)
        else:
            h = h + emb_out.astype(h.dtype)
            h = GroupNorm32(32, name="out_norm")(h)
            h = silu(h)
            if self.dropout > 0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = conv("out_conv", zero=True)(h)

        if c_out == c_in:
            skip = x
        elif self.use_conv_skip:
            skip = Conv2d(c_out, 3, dtype=self.dtype, name="skip")(x)
        else:
            skip = Conv2d(c_out, 1, dtype=self.dtype, name="skip")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention with pre-norm, zero-init projection
    (unet_new.py:332-378). Legacy head-split semantics: softmax scale is
    1/sqrt(head_dim)."""

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.channels
        heads = (
            self.num_heads
            if self.num_head_channels == -1
            else c // self.num_head_channels
        )
        b, t, h, w, _ = x.shape
        n = GroupNorm32(32, name="norm")(x).reshape(b * t, h * w, c)
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(n)
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, heads, 3, c // heads), 3, axis=3)
        out = flash_attention(q[..., 0, :], k[..., 0, :], v[..., 0, :])
        out = out.reshape(b * t, h * w, c)
        out = Dense(c, zero_init=True, dtype=self.dtype, name="proj")(out)
        return x + out.reshape(b, t, h, w, c)


class AttentionBottleBlock(nn.Module):
    """Bottleneck attention with time-embedding injection before the output
    projection (unet_new.py:381-429)."""

    channels: int
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        c = self.channels
        heads = (
            self.num_heads
            if self.num_head_channels == -1
            else c // self.num_head_channels
        )
        b, t, h, w, _ = x.shape
        n = GroupNorm32(32, name="norm")(x).reshape(b * t, h * w, c)
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(n)
        q, k, v = jnp.split(qkv.reshape(b * t, h * w, heads, 3, c // heads), 3, axis=3)
        out = flash_attention(q[..., 0, :], k[..., 0, :], v[..., 0, :])
        out = out.reshape(b, t, h, w, c)
        emb_out = Dense(c, dtype=self.dtype, name="emb_proj")(silu(emb))
        out = out + emb_out[:, :, None, None, :].astype(out.dtype)
        out = Dense(c, zero_init=True, dtype=self.dtype, name="proj")(
            out.reshape(b * t, h * w, c)
        )
        return x + out.reshape(b, t, h, w, c)


# ---------------------------------------------------------------------------
# SR3-style blocks
# ---------------------------------------------------------------------------


class SR3Block(nn.Module):
    """GroupNorm → Swish → Dropout → 3x3 conv (sr3.py:112-124)."""

    out_channels: int
    norm_groups: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = GroupNorm32(self.norm_groups, name="norm")(x)
        h = silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return Conv2d(self.out_channels, 3, dtype=self.dtype, name="conv")(h)


class SR3ResnetBlock(nn.Module):
    """SR3 residual block with additive FeatureWiseAffine noise conditioning
    (sr3.py:64-82, 126-160). ``emb`` is (B, T, emb_dim)."""

    out_channels: int
    norm_groups: int = 32
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, emb: Array, deterministic: bool = True
    ) -> Array:
        c_in = x.shape[-1]
        h = SR3Block(
            self.out_channels, self.norm_groups, dtype=self.dtype, name="block1"
        )(x, deterministic)
        noise = Dense(self.out_channels, dtype=self.dtype, name="noise_proj")(emb)
        h = h + noise[:, :, None, None, :].astype(h.dtype)
        h = SR3Block(
            self.out_channels,
            self.norm_groups,
            self.dropout,
            dtype=self.dtype,
            name="block2",
        )(h, deterministic)
        if c_in != self.out_channels:
            x = Conv2d(self.out_channels, 1, dtype=self.dtype, name="res_conv")(x)
        return h + x


class SR3SelfAttention(nn.Module):
    """Full spatial self-attention, single scale 1/sqrt(C) over the whole
    channel dim (sr3.py:164-200)."""

    channels: int
    n_head: int = 1
    norm_groups: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import math

        c = self.channels
        b, t, h, w, _ = x.shape
        n = GroupNorm32(self.norm_groups, name="norm")(x).reshape(b * t, h * w, c)
        qkv = Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(n)
        q, k, v = jnp.split(
            qkv.reshape(b * t, h * w, self.n_head, 3, c // self.n_head), 3, axis=3
        )
        # NOTE: reference scales by 1/sqrt(C) (sr3.py:185), not 1/sqrt(C/heads)
        out = dot_product_attention(
            q[..., 0, :], k[..., 0, :], v[..., 0, :], scale=1.0 / math.sqrt(c)
        )
        out = Dense(c, dtype=self.dtype, name="out")(out.reshape(b * t, h * w, c))
        return x + out.reshape(b, t, h, w, c)
