"""Differentiable JPEG codec in pure jnp (NHWC).

TPU-first re-design of guided_diffusion/jpeg.py:7-187: the unfold/fold block
bookkeeping of the reference becomes reshape+einsum (see ops.dct.block_dct8),
so the whole encode→decode round-trip is one fused XLA program that the
sampler's data-consistency step can inline (pseudoSR.py:266-277 usage).

Encoded representation matches the reference: a pair ``(luma, chroma)`` where
``luma`` is (B, H, W, 1) and ``chroma`` is (B, H/2, W/2, 2), each holding
quantised DCT coefficients laid out as 8x8 spatial blocks (jpeg.py:72-114).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dct import block_dct8, block_idct8

Array = jax.Array

# RGB↔YCbCr matrices (jpeg.py:7-28).
_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.1687, -0.3313, 0.5], [0.5, -0.4187, -0.0813]],
    dtype=np.float32,
)
_YCBCR2RGB = np.array(
    [
        [1.00000000e00, -3.68199903e-05, 1.40198758e00],
        [1.00000000e00, -3.44113281e-01, -7.14103821e-01],
        [1.00000000e00, 1.77197812e00, -1.34583413e-04],
    ],
    dtype=np.float32,
)

# Standard JPEG base quantisation tables (jpeg.py:35-58).
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


@functools.lru_cache(maxsize=None)
def quantization_matrix(qf: int) -> tuple[np.ndarray, np.ndarray]:
    """Quality-scaled (luma, chroma) quant matrices (jpeg.py:35-69)."""
    s = (5000 / qf) if qf < 50 else (200 - 2 * qf)
    q1 = np.floor((s * _Q_LUMA + 50) / 100)
    q2 = np.floor((s * _Q_CHROMA + 50) / 100)
    return np.clip(q1, 1, 255), np.clip(q2, 1, 255)


def rgb_to_ycbcr(x: Array) -> Array:
    """(..., 3) RGB in [0,255] → YCbCr, chroma offset +128 (jpeg.py:7-14)."""
    m = jnp.asarray(_RGB2YCBCR, dtype=x.dtype)
    out = jnp.einsum("...c,kc->...k", x, m)
    return out + jnp.asarray([0.0, 128.0, 128.0], dtype=x.dtype)


def ycbcr_to_rgb(x: Array) -> Array:
    """YCbCr → RGB in [0,255] (jpeg.py:17-28)."""
    x = x - jnp.asarray([0.0, 128.0, 128.0], dtype=x.dtype)
    m = jnp.asarray(_YCBCR2RGB, dtype=x.dtype)
    return jnp.einsum("...c,kc->...k", x, m)


def jpeg_encode(x: Array, qf: int) -> tuple[Array, Array]:
    """RGB (B, H, W, 3) in [-1, 1] → quantised DCT planes (jpeg.py:72-114).

    Returns ``(luma (B,H,W,1), chroma (B,H/2,W/2,2))``. Chroma is 2x2
    top-left subsampled before transform (jpeg.py:31).
    """
    x = (x + 1.0) / 2.0 * 255.0
    ycc = rgb_to_ycbcr(x)
    luma = ycc[..., :1]
    chroma = ycc[:, ::2, ::2, 1:]

    q1, q2 = quantization_matrix(qf)

    def encode_plane(p: Array, q: np.ndarray) -> Array:
        coef = block_dct8(jnp.moveaxis(p - 128.0, -1, 1))  # (B, C, H, W)
        h, w = coef.shape[-2:]
        qt = jnp.asarray(np.tile(q, (h // 8, w // 8)), dtype=coef.dtype)
        return jnp.moveaxis(jnp.round(coef / qt), 1, -1)

    return encode_plane(luma, q1), encode_plane(chroma, q2)


def jpeg_decode(planes: tuple[Array, Array], qf: int) -> Array:
    """Quantised DCT planes → RGB (B, H, W, 3) in [-1, 1] (jpeg.py:117-167).

    Chroma is upsampled by 2x2 replication, matching the reference's
    strided scatter fill (jpeg.py:152-157).
    """
    luma, chroma = planes
    q1, q2 = quantization_matrix(qf)

    def decode_plane(p: Array, q: np.ndarray) -> Array:
        coef = jnp.moveaxis(p, -1, 1)
        h, w = coef.shape[-2:]
        qt = jnp.asarray(np.tile(q, (h // 8, w // 8)), dtype=coef.dtype)
        return jnp.moveaxis(block_idct8(coef * qt) + 128.0, 1, -1)

    y = decode_plane(luma, q1)
    cc = decode_plane(chroma, q2)
    cc = jnp.repeat(jnp.repeat(cc, 2, axis=1), 2, axis=2)
    rgb = ycbcr_to_rgb(jnp.concatenate([y, cc], axis=-1))
    return rgb / 255.0 * 2.0 - 1.0


def quantization_encode(x: Array, qf: int = 32) -> Array:
    """Uniform value quantization in [-1, 1] (jpeg.py:170-186 extra codec;
    the reference hardcodes qf=32 internally, kept for parity). Matches the
    reference's ``x.int()`` truncation toward zero on negatives."""
    qf = 32
    v = ((x + 1.0) / 2.0 * 255.0).astype(jnp.int32)
    v = (v // qf).astype(jnp.float32) / (255.0 / qf)
    return v * 2.0 - 1.0


def quantization_decode(x: Array, qf: int = 32) -> Array:
    """Identity (jpeg.py:186-187): uniform quantization has no decode."""
    return x
