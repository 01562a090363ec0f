"""Attention kernels: Pallas flash attention + windowed temporal attention.

Replaces the reference's flash-attn CUDA dependency (nn.py:370-394 FalshAttn)
and the unfold-based sliding-window TemporalAttention (unet.py:664-758).

Two TPU-first design decisions (SURVEY.md §7.3 item 6):

1. Spatial attention (seq ≤ 4096, huge batch) gets a standard blocked Pallas
   flash kernel with online softmax; for small shapes we fall back to a plain
   fused einsum, which XLA compiles to MXU ops with no HBM round-trip.

2. Temporal window attention in the reference is per-pixel attention of the
   centre frame against its ≤6 neighbours after a 7x ``unfold`` blow-up.
   Because Q/K/V projections are *linear*, we never materialise the unfold:
   project each frame once, add the per-window-position embedding term in
   projected space, and compute the 6 logits with shifted elementwise
   mul-reduce. O(T·W) VPU work, zero extra HBM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def dot_product_attention(
    q: Array, k: Array, v: Array, scale: float | None = None
) -> Array:
    """Plain attention over (B, S, H, D) tensors (flash-attn layout).

    Softmax in f32 regardless of input dtype.
    """
    d = q.shape[-1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)


# ---------------------------------------------------------------------------
# Pallas flash attention (forward)
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, kv_len, block_kv):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    bq = q.shape[0]
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, kv_len // block_kv, body, (m, l, acc))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv"))
def _flash_attention_bhsd(
    q: Array, k: Array, v: Array, scale: float, block_q: int, block_kv: int
) -> Array:
    """Flash attention over (BH, S, D) flattened heads."""
    bh, sq, d = q.shape
    skv = k.shape[1]
    grid = (bh, sq // block_q)
    return pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, kv_len=skv, block_kv=block_kv
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, skv, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
    )(q, k, v)


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float | None = None,
    *,
    block_q: int = 256,
    block_kv: int = 256,
) -> Array:
    """Flash attention over (B, S, H, D) (flash-attn layout, nn.py:370-394).

    Uses the Pallas kernel when shapes tile cleanly on TPU; otherwise falls
    back to the fused-einsum path (numerically identical, f32 softmax).
    """
    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = (1.0 / math.sqrt(d)) if scale is None else scale
    on_tpu = jax.default_backend() == "tpu"
    if (
        not on_tpu
        or sq % block_q
        or skv % block_kv
        or d % 128 and d not in (32, 64)
    ):
        return dot_product_attention(q, k, v, scale)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    if d % 128:
        # exact zero-pad of the head dim to a full 128-lane tile: q·k dots
        # and p·v products are unchanged by zero features (the flagship
        # UNets use 64-channel heads, reference num_head_channels=64)
        pad = 128 - d
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, pad)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, pad)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, pad)))
    of = _flash_attention_bhsd(qf, kf, vf, scale, block_q, block_kv)
    of = of[..., :d]
    return of.reshape(b, h, sq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# Windowed temporal attention core
# ---------------------------------------------------------------------------


def temporal_window_attention(
    q_center: Array,
    k_frames: Array,
    v_frames: Array,
    k_pos: Array,
    num_frames: int,
    num_heads: int,
) -> Array:
    """Sliding-window centre-frame attention (unet.py:712-758) without the
    unfold blow-up.

    Args:
      q_center: (B, T, H, W, C) per-frame query projections, position
        embedding already added (q_linear(x + t_mid) folded by linearity).
      k_frames: (B, T, H, W, C) per-frame key projections k_linear(x)
        (WITHOUT position term).
      v_frames: (B, T, H, W, C) per-frame value projections.
      k_pos:    (F-1, C) per-window-position key embedding terms
        k_linear.weight @ t_rest[j] (bias excluded — it is already inside
        k_frames).
      num_frames: odd window size F; centre attends to the F-1 neighbours.
      num_heads: heads H; C = H * Dh.

    Frame indices are clamped at clip edges (replicate padding of the
    reference's unfold). Returns (B, T, H, W, C) attention output.
    """
    b, t, hh, ww, c = q_center.shape
    f = num_frames
    half = f // 2
    dh = c // num_heads
    scale = 1.0 / math.sqrt(dh)

    qh = q_center.reshape(b, t, hh, ww, num_heads, dh).astype(jnp.float32)

    offsets = [o for o in range(-half, half + 1) if o != 0]
    logits = []
    vals = []
    t_idx = jnp.arange(t)
    for j, o in enumerate(offsets):
        src = jnp.clip(t_idx + o, 0, t - 1)
        kj = jnp.take(k_frames, src, axis=1) + k_pos[j].astype(k_frames.dtype)
        vj = jnp.take(v_frames, src, axis=1)
        kjh = kj.reshape(b, t, hh, ww, num_heads, dh).astype(jnp.float32)
        logits.append((qh * kjh).sum(-1) * scale)  # (B,T,H,W,heads)
        vals.append(vj.reshape(b, t, hh, ww, num_heads, dh))
    logits = jnp.stack(logits, axis=-1)  # (B,T,H,W,heads,F-1)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.zeros_like(qh)
    for j in range(len(offsets)):
        out = out + probs[..., j : j + 1] * vals[j].astype(jnp.float32)
    return out.reshape(b, t, hh, ww, c).astype(q_center.dtype)
