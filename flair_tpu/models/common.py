"""Shared flax.linen building blocks (NHWC, bf16-trunk/f32-norm policy).

Replaces the reference's L1 helpers (nn.py / nn_new.py): GroupNorm32,
zero-init output convs, SiLU/Swish, Up/Downsample, video reshaping. The
LazyReshaper machinery (nn.py:350-367) disappears — frame folding is an
explicit reshape at call sites.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.norms import group_norm, shift_window_group_norm

Array = jax.Array
Dtype = Any


def fold_time(x: Array) -> tuple[Array, int]:
    """(B, T, H, W, C) → ((B·T, H, W, C), B)."""
    b, t = x.shape[0], x.shape[1]
    return x.reshape((b * t,) + x.shape[2:]), b


def unfold_time(x: Array, b: int) -> Array:
    """(B·T, H, W, C) → (B, T, H, W, C)."""
    return x.reshape((b, x.shape[0] // b) + x.shape[1:])


class Conv2d(nn.Module):
    """Per-frame 3x3-style conv applied to (B, T, H, W, C) or (B, H, W, C)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int | str = "SAME"
    use_bias: bool = True
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        video = x.ndim == 5
        if video:
            x, b = fold_time(x)
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if video:
            y = unfold_time(y, b)
        return y


class Conv3d(nn.Module):
    """3-D conv over (T, H, W) of a (B, T, H, W, C) video."""

    features: int
    kernel_size: Sequence[int] = (3, 1, 1)
    zero_init: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Conv(
            self.features,
            tuple(self.kernel_size),
            padding="SAME",
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    features: int
    zero_init: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class GroupNorm32(nn.Module):
    """GroupNorm with f32 statistics regardless of activation dtype
    (nn.py:652-654). Affine params are f32. ``axis_name``: compute the
    statistics jointly across a frame-sharded axis (shard_map)."""

    num_groups: int = 32
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        import math

        c = x.shape[-1]
        weight = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        # gcd keeps exact reference semantics for every reference config
        # (channels are always multiples of 32 there) while allowing tiny
        # test/dryrun widths that torch GroupNorm(32, c<32) would reject.
        return group_norm(x, math.gcd(self.num_groups, c), weight, bias,
                          axis_name=self.axis_name)


class ShiftWindowGroupNorm(nn.Module):
    """Temporally-windowed group norm of (B, T, H, W, C) (nn.py:657-748)."""

    win_size: int
    num_groups: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        weight = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return shift_window_group_norm(
            x, self.num_groups, self.win_size, weight, bias
        )


def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


class Upsample2x(nn.Module):
    """Nearest 2x upsample + optional conv (unet_new.py:135-166, sr3.py:90-97)."""

    features: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        video = x.ndim == 5
        if video:
            x, b = fold_time(x)
        n, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.use_conv:
            x = nn.Conv(
                self.features, (3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        if video:
            x = unfold_time(x, b)
        return x


class Downsample2x(nn.Module):
    """Strided-conv (or avg-pool) 2x downsample (unet_new.py:169-197,
    sr3.py:100-106)."""

    features: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        video = x.ndim == 5
        if video:
            x, b = fold_time(x)
        if self.use_conv:
            x = nn.Conv(
                self.features, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        else:
            x = nn.avg_pool(x, (2, 2), (2, 2))
        if video:
            x = unfold_time(x, b)
        return x


def leaky_relu(x: Array, negative_slope: float = 0.1) -> Array:
    return jnp.where(x >= 0, x, x * negative_slope)
