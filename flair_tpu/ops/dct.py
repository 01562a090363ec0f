"""DCT as dense matmuls — the TPU-native formulation.

The reference implements DCT-II/III via FFT tricks and then *materialises them
as linear layers anyway* (``guided_diffusion/dct.py:167-202`` LinearDCT). On
TPU we go straight to the matrix form: an 8x8 (or NxN) orthonormal DCT matrix
is precomputed on host in float64 and applied with einsum — a pure MXU op that
XLA fuses with the surrounding quantisation arithmetic.

Reference parity: guided_diffusion/dct.py:6-215 (dct1/idct1/dct/idct/
dct_2d/idct_2d, LinearDCT, apply_linear_2d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def _dct_matrix_np(n: int, norm: str | None) -> np.ndarray:
    """DCT-II matrix D such that (D @ x) == dct(x) over the last axis."""
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2.0 * i + 1.0) / (2.0 * n))
    if norm == "ortho":
        mat[0] /= np.sqrt(n) * 2.0
        mat[1:] /= np.sqrt(n / 2.0) * 2.0
    return mat


def dct_matrix(n: int, kind: str = "dct", norm: str | None = "ortho") -> np.ndarray:
    """Return the (n, n) float64 transform matrix for DCT-II / its inverse.

    ``idct`` is defined so that idct(dct(x)) == x, matching the reference's
    LinearDCT('idct') (dct.py:167-189).
    """
    d = _dct_matrix_np(n, norm)
    if kind == "dct":
        return d
    if kind == "idct":
        return np.linalg.inv(d)
    raise ValueError(f"unknown DCT kind: {kind}")


def dct(x: Array, norm: str | None = None) -> Array:
    """DCT-II over the last axis (dct.py:31-61)."""
    m = jnp.asarray(_dct_matrix_np(x.shape[-1], norm), dtype=x.dtype)
    return jnp.einsum("ki,...i->...k", m, x)


def idct(x: Array, norm: str | None = None) -> Array:
    """Inverse of :func:`dct` (DCT-III up to scale; dct.py:64-104)."""
    m = jnp.asarray(
        np.linalg.inv(_dct_matrix_np(x.shape[-1], norm)), dtype=x.dtype
    )
    return jnp.einsum("ki,...i->...k", m, x)


def dct1(x: Array) -> Array:
    """DCT-I over the last axis (dct.py:6-17)."""
    n = x.shape[-1]
    i = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * i[:, None] * i[None, :] / (n - 1))
    m = m * np.where((i[None, :] == 0) | (i[None, :] == n - 1), 1.0, 2.0)
    return jnp.einsum("ki,...i->...k", jnp.asarray(m, x.dtype), x)


def idct1(x: Array) -> Array:
    """Inverse DCT-I: idct1(dct1(x)) == x (dct.py:20-28)."""
    n = x.shape[-1]
    return dct1(x) / (2 * (n - 1))


def dct_2d(x: Array, norm: str | None = None) -> Array:
    """2-D DCT-II over the last two axes (dct.py:107-118)."""
    m = jnp.asarray(_dct_matrix_np(x.shape[-1], norm), dtype=x.dtype)
    m2 = jnp.asarray(_dct_matrix_np(x.shape[-2], norm), dtype=x.dtype)
    return jnp.einsum("uh,...hw,vw->...uv", m2, x, m)


def idct_2d(x: Array, norm: str | None = None) -> Array:
    """Inverse 2-D DCT (dct.py:121-133)."""
    m = jnp.asarray(np.linalg.inv(_dct_matrix_np(x.shape[-1], norm)), dtype=x.dtype)
    m2 = jnp.asarray(np.linalg.inv(_dct_matrix_np(x.shape[-2], norm)), dtype=x.dtype)
    return jnp.einsum("uh,...hw,vw->...uv", m2, x, m)


def block_dct8(x: Array) -> Array:
    """Orthonormal 8x8 block DCT of an (..., H, W) plane, H, W % 8 == 0.

    Equivalent to unfold→LinearDCT→fold in the reference JPEG codec
    (jpeg.py:86-96) but expressed as reshapes + einsum so XLA keeps it fused.
    """
    *lead, h, w = x.shape
    d = jnp.asarray(_dct_matrix_np(8, "ortho"), dtype=x.dtype)
    blocks = x.reshape(*lead, h // 8, 8, w // 8, 8)
    out = jnp.einsum("uh,...ahbw,vw->...aubv", d, blocks, d)
    return out.reshape(*lead, h, w)


def block_idct8(x: Array) -> Array:
    """Inverse of :func:`block_dct8` (jpeg.py:134-141 semantics)."""
    *lead, h, w = x.shape
    d = jnp.asarray(np.linalg.inv(_dct_matrix_np(8, "ortho")), dtype=x.dtype)
    blocks = x.reshape(*lead, h // 8, 8, w // 8, 8)
    out = jnp.einsum("uh,...ahbw,vw->...aubv", d, blocks, d)
    return out.reshape(*lead, h, w)


def dct_3d(x: Array, norm: str | None = None) -> Array:
    """DCT-II over the last three dimensions (dct.py:136-149)."""
    y = dct(x, norm)
    y = dct(y.swapaxes(-1, -2), norm).swapaxes(-1, -2)
    return dct(y.swapaxes(-1, -3), norm).swapaxes(-1, -3)


def idct_3d(x: Array, norm: str | None = None) -> Array:
    """Inverse of :func:`dct_3d` (dct.py:151-165)."""
    y = idct(x, norm)
    y = idct(y.swapaxes(-1, -2), norm).swapaxes(-1, -2)
    return idct(y.swapaxes(-1, -3), norm).swapaxes(-1, -3)
