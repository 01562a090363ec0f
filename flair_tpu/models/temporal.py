"""Temporal attention module and the temporal gating wrappers.

- ``TemporalAttention`` (unet.py:664-758 / unet_new.py:432-517): per-pixel
  sliding-window attention of each frame against its ≤6 neighbours with
  relative-position sinusoidal embeddings. The reference materialises a 7x
  ``unfold`` and runs flash-attn with q_len=1; here the window never exists
  in memory — projections are per-frame and the position terms are folded in
  by linearity (see ops.attention.temporal_window_attention).
- ``TemporalWrapper2`` (sr3.py:203-226): sigmoid mix of wrapped output and
  input, driven by a zero-init linear of the time embedding.
- ``TemporalWrapper`` (unet_new.py:50-59): pure enable/disable switch —
  expressed here as plain call-site gating.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import temporal_window_attention
from ..ops.embed import timestep_embedding
from .common import Dense, GroupNorm32, ShiftWindowGroupNorm, silu

Array = jax.Array


class TemporalAttention(nn.Module):
    """Windowed centre-frame temporal attention (unet.py:664-758).

    Input (B, T, H, W, C); returns input + zero-init-projected attention.
    """

    channels: int
    num_frames: int = 5
    num_heads: int = 1
    num_head_channels: int = -1
    norm_type: str = "group_norm"  # 'group_norm' | 'shift_window_norm' | 'none'
    # set inside shard_map to shard the frame axis across chips: the norm
    # statistics pmean over the axis (they are joint over frames) and the
    # window attention sees true neighbours via a ppermute halo exchange —
    # exact vs the unsharded forward (parallel/frame_sharded.py rationale)
    frame_axis_name: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = self.channels
        heads = (
            self.num_heads
            if self.num_head_channels == -1
            else c // self.num_head_channels
        )
        f = self.num_frames
        assert f % 2 == 1, "num_frames must be odd"

        if self.norm_type == "group_norm":
            h = GroupNorm32(32, axis_name=self.frame_axis_name, name="norm")(x)
        elif self.norm_type == "shift_window_norm":
            assert self.frame_axis_name is None, (
                "shift_window_norm is not frame-shardable"
            )
            h = ShiftWindowGroupNorm(f, 32, name="norm")(x)
        else:
            h = x

        if self.frame_axis_name is not None:
            # window attention on the halo-extended block; only the dropped
            # halo outputs see the block-edge replicate padding
            from ..parallel.halo import halo_exchange_frames

            h = halo_exchange_frames(h, f // 2, self.frame_axis_name)

        # relative-position embeddings (host numpy constants, jit-safe):
        # timestep_embedding(arange(F) - F//2, C); centre is the query term.
        import math

        rel = (np.arange(f) - f // 2).astype(np.float64)
        half = c // 2
        freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
        args = rel[:, None] * freqs[None]
        emb = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        if c % 2:
            emb = np.concatenate([emb, np.zeros_like(emb[:, :1])], axis=-1)
        emb = emb.astype(np.float32)
        t_mid = jnp.asarray(emb[f // 2], dtype=self.dtype)
        t_rest = jnp.asarray(
            np.delete(emb, f // 2, axis=0), dtype=self.dtype
        )

        q_lin = Dense(c, dtype=self.dtype, name="q_linear")
        k_lin = Dense(c, dtype=self.dtype, name="k_linear")
        v_lin = Dense(c, dtype=self.dtype, name="v_linear")

        q = q_lin(h + t_mid)  # = q_lin(h) + Wq·t_mid, by linearity
        k = k_lin(h)
        v = v_lin(h)
        # per-window-position key terms: k_lin(x + t_rest_j) = k_lin(x) + Wk·t_rest_j
        # (bias already inside k). Compute Wk·t_rest via the bias-corrected
        # difference so we reuse the same Dense params:
        zero = jnp.zeros((1, c), self.dtype)
        k_pos = k_lin(t_rest) - k_lin(zero)  # (F-1, C), bias cancelled

        out = temporal_window_attention(
            q, k, v, k_pos, num_frames=f, num_heads=heads
        )
        if self.frame_axis_name is not None and f > 1:
            # drop the halo frames; guarded so f == 1 stays a no-op instead
            # of producing an empty frame axis
            out = out[:, f // 2 : -(f // 2)]
        out = nn.Conv(
            c, (1, 1),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="proj",
        )(out)
        return x + out


class TemporalWrapper2(nn.Module):
    """Per-(frame, channel) sigmoid mix gate driven by the time embedding
    (sr3.py:203-226). Wraps ``fn``; ``emb`` is (B·T, emb_dim)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, out: Array, emb: Array) -> Array:
        b, t = x.shape[0], x.shape[1]
        w = Dense(self.features, zero_init=True, dtype=self.dtype, name="gate")(
            silu(emb)
        )
        w = w.reshape(b, t, 1, 1, self.features)
        s = jax.nn.sigmoid(w.astype(jnp.float32)).astype(x.dtype)
        return (1 - s) * x + s * out
