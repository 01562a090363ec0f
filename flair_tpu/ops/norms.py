"""Normalisation primitives with f32 statistics (NHWC / (B,T,H,W,C)).

The reference's GroupNorm32 upcasts to f32 (nn.py:652-654); here the trunk is
bf16 and norms compute statistics in f32 as dtype policy, not weight surgery.
ShiftWindowGroupNorm32 (nn.py:657-748) computes per-frame group statistics
over a sliding temporal window so statistics are temporally consistent
(SURVEY.md §5.7 mechanism 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def group_norm(
    x: Array,
    num_groups: int,
    weight: Array | None = None,
    bias: Array | None = None,
    eps: float = 1e-5,
    axis_name: str | None = None,
) -> Array:
    """GroupNorm over (B, ..., C) with stats in f32 (nn.py:652-654).

    Statistics are per batch element over ALL remaining dims × (C//G): for a
    5-D (B, T, H, W, C) video this is JOINT over the frame axis, matching the
    reference's LazyReshaper3D(GroupNorm32) convention used by every norm in
    both UNets (nn.py:350-367 + unet_new.py:238,266,358,408,461,1217).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    shape = xf.shape
    b, c = shape[0], shape[-1]
    g = num_groups
    xg = xf.reshape(b, -1, g, c // g)
    if axis_name is None:
        mean = xg.mean(axis=(1, 3), keepdims=True)
        var = xg.var(axis=(1, 3), keepdims=True)
    else:
        # frame-sharded: statistics joint over the full (sharded) frame axis
        # via pmean — shards hold equal frame counts, so the mean of local
        # moments is the global moment (parallel/frame_sharded.py)
        mean = jax.lax.pmean(xg.mean(axis=(1, 3), keepdims=True), axis_name)
        m2 = jax.lax.pmean((xg * xg).mean(axis=(1, 3), keepdims=True), axis_name)
        var = m2 - mean * mean
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    out = xg.reshape(shape)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def shift_window_group_norm(
    x: Array,
    num_groups: int,
    win_size: int,
    weight: Array | None = None,
    bias: Array | None = None,
    eps: float = 1e-5,
    padding_mode: str = "replicate",
) -> Array:
    """Sliding-temporal-window group norm of (B, T, H, W, C)
    (nn.py:657-748).

    Frame t is normalised with group statistics pooled over frames
    [t-p, t+p] (p = win_size//2), replicate- or zero-padded at the clip ends.
    Implemented without materialising the unfold: per-frame group sums are
    combined with a windowed moving sum over T (O(T·win) adds on f32 scalars
    per group — negligible), instead of the reference's 7x activation blowup.
    """
    assert win_size % 2 == 1, "win_size must be odd"
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    b, t, h, w, c = xf.shape
    g = num_groups
    p = (win_size - 1) // 2

    xg = xf.reshape(b, t, h, w, g, c // g)
    s1 = xg.sum(axis=(2, 3, 5))  # (B, T, G) per-frame sums
    s2 = (xg * xg).sum(axis=(2, 3, 5))
    n_frame = h * w * (c // g)

    if t == 1:
        mean = s1 / n_frame
        var = s2 / n_frame - mean * mean
    else:
        if padding_mode == "replicate":
            pad1 = jnp.concatenate(
                [jnp.repeat(s1[:, :1], p, 1), s1, jnp.repeat(s1[:, -1:], p, 1)], 1
            )
            pad2 = jnp.concatenate(
                [jnp.repeat(s2[:, :1], p, 1), s2, jnp.repeat(s2[:, -1:], p, 1)], 1
            )
        elif padding_mode == "zeros":
            z = jnp.zeros_like(s1[:, :p])
            pad1 = jnp.concatenate([z, s1, z], 1)
            pad2 = jnp.concatenate([z, s2, z], 1)
        else:
            raise NotImplementedError(padding_mode)
        win1 = sum(pad1[:, i : i + t] for i in range(win_size))
        win2 = sum(pad2[:, i : i + t] for i in range(win_size))
        n = n_frame * win_size
        mean = win1 / n
        var = win2 / n - mean * mean

    mean = mean[:, :, None, None, :, None]
    var = var[:, :, None, None, :, None]
    out = (xg - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    out = out.reshape(b, t, h, w, c)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
