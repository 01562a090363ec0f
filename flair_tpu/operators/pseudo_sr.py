"""FFT null-space pseudo-inverse operator for blur + decimation degradations.

Re-design of pseudoSR.py:15-416. Host side (numpy float64): build the
downscale kernel, form hᵀh, invert it in the Fourier domain with a magnitude
floor, recentre/trim the spatial inverse filter. Device side: the whole
operator is three fixed depthwise convolutions + strided sampling — the
reference wraps them in torch ``Filter_Layer`` modules; here they are plain
jnp functions XLA fuses straight into the sampler step (SURVEY.md §3.3).

``A_pinv(y, x)`` returns the null-space decomposition correction
A⁺A(x) − A⁺(y) (optionally with a JPEG round-trip inserted after the
downscale, pseudoSR.py:248-281); ``A(x)`` is the degradation itself.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.jpeg import jpeg_decode, jpeg_encode
from ..ops.resize import (
    calc_strides,
    depthwise_filter2d,
    imresize_efficient,
    imresize_kernel,
)

Array = jax.Array


@dataclasses.dataclass
class PseudoSRConf:
    """pseudoSR configuration (pseudoSR.py:397-410 Get_pseudoSR_Conf)."""

    scale_factor: int = 4
    lower_magnitude_bound: float = 0.01
    filter_pertubation_limit: float = 1.1
    sigmoid_range_limit: bool = False
    input_range: tuple = (-1.0, 1.0)
    nfft_add: int = 36
    inv_hth_half_size: int = 26


def get_pseudo_sr_conf(sf: int) -> PseudoSRConf:
    return PseudoSRConf(scale_factor=sf)


def _aliased_downsample(arr: np.ndarray, factor: int) -> np.ndarray:
    """Centre-aligned decimation (pseudoSR.py:315-321)."""
    pre, _ = calc_strides(arr.shape, 1.0 / factor, align_center=True)
    return arr[pre[0] :: factor, pre[1] :: factor]


def _compute_inv_hth(ds_kernel: np.ndarray, conf: PseudoSRConf) -> np.ndarray:
    """Fourier-domain inverse of hᵀh with magnitude floor
    (pseudoSR.py:123-171)."""
    from scipy.signal import convolve2d

    sf = conf.scale_factor
    hth = convolve2d(ds_kernel, np.rot90(ds_kernel, 2)) * sf**2
    hth = _aliased_downsample(hth, sf)
    pad = conf.nfft_add // 2
    hth_fft = np.fft.fft2(np.pad(hth, ((pad, pad), (pad, pad))))
    boost = np.maximum(1.0, conf.lower_magnitude_bound / np.abs(hth_fft))
    inv = np.real(np.fft.ifft2(1.0 / (hth_fft * boost)))

    # recentre on the max (pseudoSR.py:146-166)
    n = inv.shape[0]
    max_row, max_col = np.unravel_index(np.argmax(inv), inv.shape)
    if not np.all(
        np.equal(np.ceil(np.array(inv.shape) / 2), np.array([max_row, max_col]) - 1)
    ):
        half = int(
            np.min([n - max_row - 1, n - max_col - 1, max_row, max_col])
        )
        inv = inv[
            max_row - half : max_row + half + 1,
            max_col - half : max_col + half + 1,
        ]
    drop = inv.shape[0] // 2 - conf.inv_hth_half_size
    if drop > 0:
        inv = inv[drop:-drop, drop:-drop]
    return inv.astype(np.float32)


class PseudoSR:
    """Null-space pseudo-inverse operator (pseudoSR.py:47-295).

    All filters are host-built numpy constants; the apply methods are pure
    jnp on NHWC tensors and jit/scan-safe.
    """

    def __init__(
        self,
        conf: PseudoSRConf,
        blur_kernel: Optional[np.ndarray] = None,
        kernel_indx: int = 0,
    ):
        self.conf = conf
        sf = int(conf.scale_factor)
        self.ds_factor = sf
        self.ds_kernel, self.pre_stride, self.post_stride = imresize_kernel(
            sf, blur_kernel, kernel_indx
        )
        self.inv_hth = _compute_inv_hth(self.ds_kernel.astype(np.float64), conf)
        # fixed device filters (pseudoSR_PyTorch.__init__, pseudoSR.py:174-246)
        self.downscale_aa = np.rot90(self.ds_kernel, 2).copy()
        self.upscale_aa = (self.ds_kernel * sf**2).copy()
        self.invalidity_margins_LR = 2 * sf + conf.inv_hth_half_size
        self.invalidity_margins_HR = sf * self.invalidity_margins_LR

    # -- building blocks ------------------------------------------------------

    def conv_inv_hth(self, lr: Array) -> Array:
        """Replication-padded correlation with inv(hᵀh) (pseudoSR.py:189-193)."""
        return depthwise_filter2d(
            lr, self.inv_hth, padding="edge", correlate=True
        )

    def upscale(self, lr: Array) -> Array:
        """Zero-stuffing upscale + antialias correlation (pseudoSR.py:195-222)."""
        b, h, w, c = lr.shape
        sf = self.ds_factor
        up = jnp.zeros((b, h, sf, w, sf, c), lr.dtype)
        up = up.at[:, :, self.pre_stride[0], :, self.pre_stride[1], :].set(lr)
        up = up.reshape(b, h * sf, w * sf, c)
        return depthwise_filter2d(
            up, self.upscale_aa, padding="edge", correlate=True
        )

    def downscale(self, hr: Array) -> Array:
        """Antialias correlation + aliased decimation (pseudoSR.py:223-243)."""
        y = depthwise_filter2d(
            hr, self.downscale_aa, padding="edge", correlate=True
        )
        b, hh, ww, c = y.shape
        sf = self.ds_factor
        y = y.reshape(b, hh // sf, sf, ww // sf, sf, c)
        return y[:, :, self.pre_stride[0], :, self.pre_stride[1], :]

    # -- operator interface ----------------------------------------------------

    def A(self, hr: Array, use_zero_padding: bool = False) -> Array:
        """True degradation: antialias filter + phase-aligned decimation
        (pseudoSR.py:283-295 → imresize_efficient)."""
        return imresize_efficient(
            hr,
            self.ds_kernel,
            self.ds_factor,
            self.pre_stride,
            self.post_stride,
            use_zero_padding=use_zero_padding,
        )

    def A_pinv(
        self,
        lr: Array,
        generated: Optional[Array] = None,
        jpeg_qf: Optional[int] = None,
    ) -> Array:
        """Null-space correction (pseudoSR.py:248-281).

        With ``generated``: returns A⁺A(x_gen) − A⁺(y) — the quantity the
        guided sampler subtracts (γ-scaled) from x0. Without: returns A⁺(y).
        ``jpeg_qf`` inserts the differentiable JPEG round-trip after the
        downscale (the jpeg task, scripts/video_sample.py:450-456).
        """
        lr = lr[..., -3:]
        ortho_lr = self.upscale(self.conv_inv_hth(lr))
        if generated is None:
            return ortho_lr
        down = self.downscale(generated)
        if jpeg_qf is not None:
            down = jpeg_decode(jpeg_encode(down, jpeg_qf), jpeg_qf)
        ortho_gen = self.upscale(self.conv_inv_hth(down))
        return ortho_gen - ortho_lr

    def Lambda(self, vec: Array, a, sigma_y, sigma_t, eta) -> Array:
        """Scalar DDRM Λ (pseudoSR.py:297-305)."""
        factor = sigma_t * (1 - eta**2) ** 0.5 / a / sigma_y
        return jnp.where(
            jnp.mean(sigma_t) < jnp.mean(a * sigma_y), vec * factor, vec
        )

    def Lambda_noise(self, vec: Array, a, sigma_y, sigma_t, eta, epsilon=None) -> Array:
        """Scalar DDRM Λ-noise (pseudoSR.py:307-312)."""
        factor = jnp.sqrt(jnp.maximum(sigma_t**2 - a**2 * sigma_y**2, 0.0))
        return jnp.where(
            jnp.mean(sigma_t) >= jnp.mean(a * sigma_y),
            vec * factor,
            vec * sigma_t * eta,
        )
