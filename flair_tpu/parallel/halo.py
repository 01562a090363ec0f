"""Halo exchange for frame-axis (sequence) parallelism.

The temporal attention window is ≤7 frames (unet.py:664-758) and BasicVSR++
is a 1-frame recurrence, so sharding the T axis across chips needs only a
3-frame halo per side (SURVEY.md §5.7). This helper runs inside shard_map:
each shard ppermutes its boundary frames to both neighbours and returns the
haloed local block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def halo_exchange_frames(x: Array, halo: int, axis_name: str) -> Array:
    """(B, T_local, ...) → (B, T_local + 2·halo, ...) with neighbour frames.

    Edge shards receive replicated copies of their own boundary (matching
    the replicate padding the temporal window attention applies at clip
    ends, unet.py:723-729).
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    left_edge = x[:, :1]
    right_edge = x[:, -1:]
    send_right = x[:, -halo:]
    send_left = x[:, :halo]

    # from left neighbour (shard i receives shard i-1's tail)
    from_left = lax.ppermute(
        send_right, axis_name, [(i, (i + 1) % n) for i in range(n)]
    )
    # from right neighbour (shard i receives shard i+1's head)
    from_right = lax.ppermute(
        send_left, axis_name, [(i, (i - 1) % n) for i in range(n)]
    )

    # replicate own edges on the clip boundary shards
    is_first = (idx == 0)
    is_last = (idx == n - 1)
    left_pad = jnp.where(
        is_first, jnp.concatenate([left_edge] * halo, axis=1), from_left
    )
    right_pad = jnp.where(
        is_last, jnp.concatenate([right_edge] * halo, axis=1), from_right
    )
    return jnp.concatenate([left_pad, x, right_pad], axis=1)
