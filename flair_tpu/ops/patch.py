"""Spatio-temporal tiling with overlap merge (memory-bound fallback path).

Functional JAX re-design of the reference's patchify/unpatchify CPU-offload
machinery (nn.py:26-338): blocks are extracted on a static grid, processed,
and merged back with one of the reference's merge modes. The reference's
``SliceProcessor*`` CPU-offload family is unnecessary on TPU — XLA + remat
cover the memory pressure — but the tiling itself remains useful for
resolutions beyond HBM (SURVEY.md §5.7 mechanism 5).

Blocks are (B, T, H, W, C) videos; grid covers (T, H, W).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _grid_starts(size: int, block: int, stride: int) -> list[int]:
    """Start offsets of each block after symmetric padding to a full grid."""
    n = max(0, math.ceil((size - block) / stride))
    return [i * stride for i in range(n + 1)]


def _padding(size: int, block: int, stride: int) -> tuple[int, int]:
    pad = (math.ceil(max(0, size - block) / stride) * stride + block - size) / 2
    return math.ceil(pad), math.floor(pad)


def patchify(
    x: Array,
    block_size: Sequence[int],
    stride: Sequence[int],
    padding_mode: str = "constant",
):
    """Split (B, T, H, W, C) into overlapping blocks (nn.py:26-63).

    Returns (blocks (N, B, bt, bh, bw, C), meta) where meta carries the grid
    needed by :func:`unpatchify`.
    """
    b, t, h, w, c = x.shape
    (pt0, pt1), (ph0, ph1), (pw0, pw1) = (
        _padding(t, block_size[0], stride[0]),
        _padding(h, block_size[1], stride[1]),
        _padding(w, block_size[2], stride[2]),
    )
    mode = {"constant": "constant", "edge": "edge", "reflect": "reflect"}[padding_mode]
    xp = jnp.pad(
        x, ((0, 0), (pt0, pt1), (ph0, ph1), (pw0, pw1), (0, 0)), mode=mode
    )
    ts = _grid_starts(xp.shape[1], block_size[0], stride[0])
    hs = _grid_starts(xp.shape[2], block_size[1], stride[1])
    ws = _grid_starts(xp.shape[3], block_size[2], stride[2])
    blocks = []
    for tt in ts:
        for hh in hs:
            for ww in ws:
                blocks.append(
                    jax.lax.dynamic_slice(
                        xp,
                        (0, tt, hh, ww, 0),
                        (b, block_size[0], block_size[1], block_size[2], c),
                    )
                )
    meta = dict(
        orig_shape=(b, t, h, w, c),
        padded_shape=xp.shape,
        pads=((pt0, pt1), (ph0, ph1), (pw0, pw1)),
        starts=(ts, hs, ws),
        block_size=tuple(block_size),
        stride=tuple(stride),
    )
    return jnp.stack(blocks), meta


def _linear_ramp(block: int, overlap: int) -> np.ndarray:
    """Feathering weight along one axis: linear ramp over the overlap."""
    wgt = np.ones(block, dtype=np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap, dtype=np.float32) + 1) / (overlap + 1)
        wgt[:overlap] = ramp
        wgt[-overlap:] = ramp[::-1]
    return wgt


def unpatchify(blocks: Array, meta: dict, merge: str = "mean") -> Array:
    """Merge processed blocks back (nn.py:66-338 merge modes).

    merge ∈ {'mean', 'linear', 'mid', 'max', 'min'}:
    - mean:   overlap regions averaged (scatter-add / count).
    - linear: feathered blend with linear ramps over the overlap.
    - mid:    each output pixel from the block whose centre is nearest
              (implemented by trimming half-overlap margins).
    - max/min: elementwise extremum over contributing blocks.
    """
    b, t, h, w, c = meta["orig_shape"]
    ts, hs, ws = meta["starts"]
    bt, bh, bw = meta["block_size"]
    st, sh, sw = meta["stride"]
    padded = meta["padded_shape"]
    (pt0, _), (ph0, _), (pw0, _) = meta["pads"]

    if merge in ("max", "min"):
        init = jnp.full(padded, -jnp.inf if merge == "max" else jnp.inf, blocks.dtype)
        op = jnp.maximum if merge == "max" else jnp.minimum
        i = 0
        out = init
        for tt in ts:
            for hh in hs:
                for ww in ws:
                    cur = jax.lax.dynamic_slice(
                        out, (0, tt, hh, ww, 0), (b, bt, bh, bw, c)
                    )
                    out = jax.lax.dynamic_update_slice(
                        out, op(cur, blocks[i]), (0, tt, hh, ww, 0)
                    )
                    i += 1
        return out[:, pt0 : pt0 + t, ph0 : ph0 + h, pw0 : pw0 + w, :]

    if merge == "linear":
        ot, oh, ow = bt - st, bh - sh, bw - sw
        wgt = (
            _linear_ramp(bt, ot)[:, None, None]
            * _linear_ramp(bh, oh)[None, :, None]
            * _linear_ramp(bw, ow)[None, None, :]
        )
        weight_block = jnp.asarray(wgt, blocks.dtype)[None, :, :, :, None]
    else:
        weight_block = jnp.ones((1, bt, bh, bw, 1), blocks.dtype)

    if merge == "mid":
        # keep only the Voronoi-interior of each block (trim half-overlap,
        # except at grid borders)
        pass  # handled via per-block weights below

    acc = jnp.zeros(padded, blocks.dtype)
    den = jnp.zeros(padded, blocks.dtype)
    i = 0
    for ti, tt in enumerate(ts):
        for hi, hh in enumerate(hs):
            for wi, ww in enumerate(ws):
                wb = weight_block
                if merge == "mid":
                    m = np.ones((1, bt, bh, bw, 1), dtype=np.float32)
                    ot, oh, ow = (bt - st) // 2, (bh - sh) // 2, (bw - sw) // 2
                    if ti != 0 and ot > 0:
                        m[:, :ot] = 0
                    if ti != len(ts) - 1 and ot > 0:
                        m[:, bt - ot :] = 0
                    if hi != 0 and oh > 0:
                        m[:, :, :oh] = 0
                    if hi != len(hs) - 1 and oh > 0:
                        m[:, :, bh - oh :] = 0
                    if wi != 0 and ow > 0:
                        m[:, :, :, :ow] = 0
                    if wi != len(ws) - 1 and ow > 0:
                        m[:, :, :, bw - ow :] = 0
                    wb = jnp.asarray(m, blocks.dtype)
                upd = jax.lax.dynamic_slice(
                    acc, (0, tt, hh, ww, 0), (b, bt, bh, bw, c)
                )
                acc = jax.lax.dynamic_update_slice(
                    acc, upd + blocks[i] * wb, (0, tt, hh, ww, 0)
                )
                dupd = jax.lax.dynamic_slice(
                    den, (0, tt, hh, ww, 0), (b, bt, bh, bw, c)
                )
                den = jax.lax.dynamic_update_slice(
                    den, dupd + wb, (0, tt, hh, ww, 0)
                )
                i += 1
    out = acc / jnp.maximum(den, 1e-8)
    return out[:, pt0 : pt0 + t, ph0 : ph0 + h, pw0 : pw0 + w, :]


def process_patched(
    x: Array,
    fn: Callable[[Array], Array],
    block_size: Sequence[int],
    stride: Sequence[int],
    merge: str = "mean",
    padding_mode: str = "constant",
) -> Array:
    """patchify → fn per block (lax.map, bounded memory) → unpatchify."""
    blocks, meta = patchify(x, block_size, stride, padding_mode)
    blocks = jax.lax.map(fn, blocks)
    return unpatchify(blocks, meta, merge)
