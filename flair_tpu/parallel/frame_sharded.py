"""Frame-axis (sequence) parallelism for temporal ops via shard_map + halo.

The reference scales sequence length with single-device mechanisms only
(SURVEY.md §5.7); on TPU the frame axis of a video batch is sharded across
chips. Temporal *window* attention (window ≤7, unet.py:664-758) needs two
collectives to shard exactly:

1. its GroupNorm statistics are joint over frames (LazyReshaper3D
   convention) → pmean over the frame axis (ops/norms.group_norm
   ``axis_name``);
2. each output frame attends to ≤3 true neighbours per side → a ppermute
   halo exchange of the normalised features (parallel/halo.py), computing
   attention on the halo-extended block and dropping the halo outputs
   (only those see the block-edge replicate padding).

``TemporalAttention(frame_axis_name=...)`` performs both internally;
``frame_sharded_temporal_attention`` wraps it in shard_map. The BasicVSR++
recurrence is inherently sequential over frames and stays under jit/GSPMD
(sharding it serialises through the scan; no speedup exists by
construction).

``frame_sharded`` is the generic wrapper for ops that are already
frame-local up to a halo (no cross-shard statistics).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .halo import halo_exchange_frames

Array = jax.Array


def frame_sharded(
    fn: Callable[[Array], Array],
    mesh: Mesh,
    *,
    halo: int,
    frame_axis: str = "frame",
    data_axis: str | None = "data",
) -> Callable[[Array], Array]:
    """Shard a frame-LOCAL temporal op ``fn((B, T, ...)) -> (B, T, ...)``
    (output frame t depends only on input frames [t-halo, t+halo], no
    cross-frame statistics) over ``frame_axis``. T must divide evenly."""
    spec = P(data_axis, frame_axis)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_rep=False,
    )
    def wrapped(x: Array) -> Array:
        xh = halo_exchange_frames(x, halo, frame_axis)
        y = fn(xh)
        return y[:, halo:-halo]

    return wrapped


def frame_sharded_temporal_attention(
    attn_module: Any,
    params,
    mesh: Mesh,
    *,
    frame_axis: str = "frame",
    data_axis: str | None = "data",
) -> Callable[[Array], Array]:
    """Exact frame-sharded forward of a ``TemporalAttention`` module:
    clones it with ``frame_axis_name`` set (pmean norm stats + halo inside)
    and wraps the apply in shard_map over (data, frame)."""
    sharded_mod = attn_module.copy(frame_axis_name=frame_axis)
    spec = P(data_axis, frame_axis)

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(spec,), out_specs=spec,
        check_rep=False,
    )
    def wrapped(x: Array) -> Array:
        return sharded_mod.apply(params, x)

    return wrapped
