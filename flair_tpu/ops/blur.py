"""Gaussian blur as separable depthwise convs (cv2.GaussianBlur parity).

Used for the face paste-back mask softening
(face_restoration_helper.py:305-321: two GaussianBlur((101,101), 11|26|4)
passes) — on device so the whole paste lives inside the jitted sampler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel parity (host, float64)."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return k / k.sum()


def gaussian_blur(x: Array, ksize: int, sigma: float) -> Array:
    """Separable Gaussian blur of NHWC ``x`` with reflect-101 padding
    (cv2 BORDER_DEFAULT)."""
    k = gaussian_kernel_1d(ksize, sigma)
    kj = jnp.asarray(k, dtype=x.dtype)
    c = x.shape[-1]
    p = ksize // 2
    # reflect-101: cv2's default border (no edge duplicate) == numpy 'reflect'
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)), mode="reflect")
    rhs_h = jnp.tile(kj[:, None, None, None], (1, 1, 1, c))
    x = jax.lax.conv_general_dilated(
        xp, rhs_h, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    xp = jnp.pad(x, ((0, 0), (0, 0), (p, p), (0, 0)), mode="reflect")
    rhs_w = jnp.tile(kj[None, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, rhs_w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
