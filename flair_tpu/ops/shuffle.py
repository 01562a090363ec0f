"""Pixel shuffle / unshuffle as reshape+transpose (NHWC).

TPU-native replacement for mmedit's PixelShufflePack CUDA path
(used by BasicVSRPP upsampling, davsr.py:14; unet_new.py:25).
"""

from __future__ import annotations

import jax

Array = jax.Array


def pixel_shuffle(x: Array, factor: int) -> Array:
    """(..., H, W, C·r²) → (..., H·r, W·r, C). torch.pixel_shuffle parity:
    input channel (c, ry, rx) → output (ry, rx, c) position."""
    *lead, h, w, crr = x.shape
    r = factor
    c = crr // (r * r)
    x = x.reshape(*lead, h, w, c, r, r)
    n = len(lead)
    # (..., h, w, c, ry, rx) → (..., h, ry, w, rx, c)
    perm = tuple(range(n)) + (n, n + 3, n + 1, n + 4, n + 2)
    x = x.transpose(perm)
    return x.reshape(*lead, h * r, w * r, c)


def pixel_unshuffle(x: Array, factor: int) -> Array:
    """(..., H·r, W·r, C) → (..., H, W, C·r²), inverse of pixel_shuffle."""
    *lead, hr, wr, c = x.shape
    r = factor
    h, w = hr // r, wr // r
    x = x.reshape(*lead, h, r, w, r, c)
    n = len(lead)
    # (..., h, ry, w, rx, c) → (..., h, w, c, ry, rx)
    perm = tuple(range(n)) + (n, n + 2, n + 4, n + 1, n + 3)
    x = x.transpose(perm)
    return x.reshape(*lead, h, w, c * r * r)
