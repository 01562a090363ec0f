"""Resize machinery: cubic kernels, MATLAB/cv2-compatible resampling, and
separable resize expressed as (H_out, H_in) / (W_out, W_in) matrix products.

TPU-first design: every resize with static shapes becomes two small dense
matmuls ``R_h @ img @ R_w^T`` (MXU-friendly, fusible), instead of the
reference's host-side scipy convs + torch grouped convs. Kernel *synthesis*
stays on host in float64, matching the reference's numerical pipeline.

Reference parity:
- cubic kernel from a cv2 delta-image  → imresize_pseudoSR.py:96-109
  (synthesised analytically here: cv2.INTER_CUBIC is the Keys bicubic with
  a = -0.75 sampled at half-pixel-aligned positions; validated against cv2
  in tests).
- calc_strides pre/post phases         → imresize_pseudoSR.py:81-94
- Center_Mass kernel recentring        → imresize_pseudoSR.py:121-157
- imresize / imresize_efficient        → imresize_pseudoSR.py:10-79,163-178
- torch F.interpolate(bicubic/area/bilinear) semantics for rnn_input / init
  resizes (scripts/video_sample.py:372-425) as resize_bicubic/area/bilinear.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Kernel synthesis (host, float64)
# ---------------------------------------------------------------------------


def keys_cubic(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys piecewise-cubic interpolation kernel, support [-2, 2].

    a = -0.75 is cv2/torch bicubic; a = -0.5 is Catmull-Rom (MATLAB/PIL).
    """
    x = np.abs(np.asarray(x, dtype=np.float64))
    x2, x3 = x * x, x * x * x
    inner = (a + 2) * x3 - (a + 3) * x2 + 1
    outer = a * x3 - 5 * a * x2 + 8 * a * x - 4 * a
    return np.where(x <= 1, inner, np.where(x < 2, outer, 0.0))


@functools.lru_cache(maxsize=None)
def cubic_kernel_1d(sf: int, a: float = -0.75) -> np.ndarray:
    """1-D upscale-by-``sf`` cubic kernel, trimmed to its nonzero support.

    Equals the centre row of the reference's cv2-delta-image construction
    (imresize_pseudoSR.py:96-102): upscaling a unit impulse by ``sf`` with
    INTER_CUBIC samples the Keys kernel at x_i = (i + 0.5)/sf - 0.5 - c.
    """
    D = 11  # delta image size, as in the reference
    c = int(np.ceil(D / 2)) - 1
    i = np.arange(sf * D, dtype=np.float64)
    x = (i + 0.5) / sf - 0.5 - c
    k = keys_cubic(x, a)
    nz = np.nonzero(np.abs(k) > 0)[0]
    return k[nz[0] : nz[-1] + 1]


def cubic_kernel_2d(sf: int, a: float = -0.75) -> np.ndarray:
    """Separable 2-D cubic upscale kernel (imresize_pseudoSR.py:96-102)."""
    k = cubic_kernel_1d(sf, a)
    return np.outer(k, k)


def calc_strides(shape, factor, align_center: bool = False):
    """Pre/post decimation phases for an integer scale factor
    (imresize_pseudoSR.py:81-94). Returns (pre_stride, post_stride), each a
    length-2 int array."""
    integer_factor = int(np.maximum(factor, 1.0 / factor))
    if align_center:
        half = np.ceil(
            np.array(shape[:2], dtype=np.float64)
            / 2
            * (factor if factor > 1 else 1)
        )
        pre = np.mod(half, integer_factor)
        pre[pre == 0] = integer_factor
        pre = (pre - 1).astype(np.int64)
        post = integer_factor - pre - 1
    else:
        post = (np.floor(integer_factor / 2) * np.ones(2)).astype(np.int64)
        pre = (integer_factor - post - 1).astype(np.int64)
    return pre, post


def _energy_distribution(kern: np.ndarray) -> np.ndarray:
    """Relative L2 energy retained when trimming n-pixel margins
    (imresize_pseudoSR.py:159-161)."""
    total = np.sqrt(np.sum(kern**2))
    vals = [total] + [
        np.sqrt(np.sum(kern[n:-n, n:-n] ** 2))
        for n in range(1, int(np.ceil(kern.shape[0] / 2)))
    ]
    return np.asarray(vals) / total


def center_mass(kernel: np.ndarray, ds_factor: int) -> np.ndarray:
    """Re-centre a supplied blur kernel on its centre of mass, then trim to a
    conv-valid size that is a multiple of ``ds_factor``
    (imresize_pseudoSR.py:121-157). Host-side float64."""
    assert kernel.shape[0] == kernel.shape[1], "square kernels only"
    from scipy.signal import convolve2d

    n = kernel.shape[0]
    xg, yg = np.meshgrid(np.arange(n), np.arange(n))
    xg = convolve2d(xg, kernel, mode="valid") + 1
    yg = convolve2d(yg, kernel, mode="valid") + 1
    x_pad, y_pad = 2 * (n / 2 - xg), 2 * (n / 2 - yg)
    padding_diff = np.round(np.abs(y_pad)) - np.round(np.abs(x_pad))
    pre_x, post_x = np.maximum(0, -x_pad), np.maximum(0, x_pad)
    pre_y, post_y = np.maximum(0, -y_pad), np.maximum(0, y_pad)

    def r2i(v):
        return int(np.round(v))

    def split_padding(pre, post, diff):
        offset_right = np.round(post) - post - (np.round(pre) - pre)
        pre, post = r2i(pre), r2i(post)
        if offset_right > 0:
            post += int(np.ceil(diff / 2))
            pre += int(np.floor(diff / 2))
        else:
            pre += int(np.ceil(diff / 2))
            post += int(np.floor(diff / 2))
        return pre, post

    if padding_diff > 0:
        pre_y, post_y = r2i(pre_y), r2i(post_y)
        pre_x, post_x = split_padding(pre_x, post_x, padding_diff)
    elif padding_diff < 0:
        pre_x, post_x = r2i(pre_x), r2i(post_x)
        pre_y, post_y = split_padding(pre_y, post_y, -padding_diff)
    else:
        pre_x, post_x = r2i(pre_x), r2i(post_x)
        pre_y, post_y = r2i(pre_y), r2i(post_y)
    kernel = np.pad(kernel, ((pre_y, post_y), (pre_x, post_x)), mode="constant")
    assert kernel.shape[0] == kernel.shape[1]

    margins = np.argwhere(_energy_distribution(kernel) < 0.99)[0][0] * np.ones(
        2, dtype=np.int64
    )
    idx = 0
    while (
        np.mod(
            kernel.shape[0] - np.sum(margins) - 1 + np.mod(ds_factor + 1, 2),
            ds_factor,
        )
        != 0
    ):
        margins[idx] -= 1
        idx = (idx + 1) % 2
    kernel = kernel[margins[0] : -margins[1], margins[0] : -margins[1]]
    return kernel / np.sum(kernel)


def imresize_kernel(
    ds_factor: int,
    blur_kernel: np.ndarray | None = None,
    kernel_indx: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the downscale antialiasing kernel + strides for pseudoSR
    (pseudoSR.py:332-343 Return_kernel + imresize_pseudoSR.py:10-62 kernel
    bookkeeping, without the stateful cache).

    - ``blur_kernel is None``  → pure cubic kernel (x4 bicubic path).
    - ``kernel_indx >= 8``     → the supplied kernel *replaces* the cubic one
      after centre-of-mass recentring (the demo's kernels_12.mat[0,3] path,
      scripts/video_sample.py:249-259 with kernel_indx=11).
    - ``kernel_indx < 8``      → cubic ⊛ blur kernel.

    Returns (ds_kernel, pre_stride, post_stride); ``ds_kernel`` sums to 1 and
    is already rotated for downscaling (Return_kernel divides by sf² and
    rot90s twice).
    """
    from scipy.signal import convolve2d

    sf = int(ds_factor)
    pre, post = calc_strides((0, 0), sf)
    post_padding = np.maximum(0, pre - post)
    pre_padding = np.maximum(0, post - pre)
    if blur_kernel is None:
        up = cubic_kernel_2d(sf)
    elif kernel_indx >= 8:
        assert abs(1.0 - np.sum(blur_kernel)) < np.finfo(np.float32).eps
        up = center_mass(np.asarray(blur_kernel, np.float64), ds_factor=sf) * sf**2
    else:
        up = convolve2d(cubic_kernel_2d(sf), np.asarray(blur_kernel, np.float64))
    up = np.pad(
        up,
        (
            (pre_padding[0], post_padding[0]),
            (pre_padding[1], post_padding[1]),
        ),
        mode="constant",
    )
    # Downscale kernel = rot180 of the (asymmetrically padded) upscale kernel
    # scaled by sf⁻² (pseudoSR.py:332-343 Return_kernel). The rotation moves
    # the even-factor padding to the other side — it matters.
    ds_kernel = (up[::-1, ::-1] / sf**2).astype(np.float32)
    return ds_kernel, pre, post


# ---------------------------------------------------------------------------
# Device application
# ---------------------------------------------------------------------------


def _reflect_pad_2d(x: Array, pad_h: int, pad_w: int) -> Array:
    """torch-style 'reflect' padding (no edge repeat) on H, W of NHWC."""
    return jnp.pad(
        x, ((0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0)), mode="reflect"
    )


def depthwise_filter2d(
    x: Array,
    kernel: np.ndarray | Array,
    *,
    padding: str = "reflect",
    correlate: bool = False,
) -> Array:
    """Depthwise 2-D filter of NHWC input with a single shared 2-D kernel.

    By default performs true convolution (kernel flipped), matching the
    reference's rot90(k, 2)-then-correlate trick
    (imresize_pseudoSR.py:165-178). ``padding``: 'reflect' | 'zero' | 'none'.
    """
    k = jnp.asarray(kernel, dtype=x.dtype)
    if not correlate:
        k = k[::-1, ::-1]
    kh, kw = k.shape
    c = x.shape[-1]
    if padding == "reflect":
        x = _reflect_pad_2d(x, kh // 2, kw // 2)
        pad = "VALID"
    elif padding == "edge":
        x = jnp.pad(
            x,
            ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
            mode="edge",
        )
        pad = "VALID"
    elif padding == "zero":
        x = jnp.pad(
            x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0))
        )
        pad = "VALID"
    else:
        pad = "VALID"
    rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, c))  # HWIO, I=1 (depthwise)
    return jax.lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def imresize_efficient(
    x: Array,
    ds_kernel: np.ndarray,
    ds_factor: int,
    pre_stride,
    post_stride,
    *,
    use_zero_padding: bool = False,
) -> Array:
    """Antialias-filter + phase-aligned decimation of NHWC input — the
    pseudoSR ``A`` operator (imresize_pseudoSR.py:163-178)."""
    y = depthwise_filter2d(
        x, ds_kernel, padding="zero" if use_zero_padding else "reflect"
    )
    return y[:, pre_stride[0] :: ds_factor, pre_stride[1] :: ds_factor, :]


def matlab_imresize(x: Array, ds_factor: int, blur_kernel=None, kernel_indx: int = 0):
    """Full imresize (downscale path) on device (imresize_pseudoSR.py:10-79)."""
    k, pre, post = imresize_kernel(ds_factor, blur_kernel, kernel_indx)
    return imresize_efficient(x, k, ds_factor, pre, post)


# ---------------------------------------------------------------------------
# Interpolation-style resizes (torch F.interpolate semantics) as matmuls
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _interp_matrix_np(
    out_size: int, in_size: int, mode: str, a: float = -0.75
) -> np.ndarray:
    """(out_size, in_size) row-stochastic resample matrix, float64 host.

    'bicubic'/'bilinear' use half-pixel centres with edge clamping and NO
    antialiasing (torch F.interpolate align_corners=False defaults, which is
    what the reference CLI uses for rnn_input/init resizes). 'area' is
    adaptive average pooling. 'nearest' is floor-index selection.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "area":
        for i in range(out_size):
            lo = int(np.floor(i * in_size / out_size))
            hi = int(np.ceil((i + 1) * in_size / out_size))
            m[i, lo:hi] = 1.0 / (hi - lo)
        return m
    if mode == "nearest":
        for i in range(out_size):
            m[i, min(int(i * in_size / out_size), in_size - 1)] = 1.0
        return m
    scale = in_size / out_size
    if mode == "bilinear_aa":
        # torch F.interpolate(antialias=True): triangle kernel stretched by
        # the scale factor on downscale (unet.py:545-549 lqs resize); equals
        # plain bilinear when upscaling.
        if scale <= 1.0:
            return _interp_matrix_np(out_size, in_size, "bilinear", a)
        for i in range(out_size):
            x = (i + 0.5) * scale - 0.5
            lo = int(np.floor(x - scale)) + 1
            hi = int(np.ceil(x + scale))
            js = np.arange(lo, hi + 1)
            w = np.maximum(0.0, 1.0 - np.abs(js - x) / scale)
            w = w / w.sum()
            for j, wgt in zip(js, w):
                m[i, int(np.clip(j, 0, in_size - 1))] += wgt
        return m
    for i in range(out_size):
        x = (i + 0.5) * scale - 0.5
        if mode == "bilinear":
            x0 = int(np.floor(x))
            f = x - x0
            for j, wgt in ((x0, 1 - f), (x0 + 1, f)):
                m[i, int(np.clip(j, 0, in_size - 1))] += wgt
        elif mode == "bicubic":
            x0 = int(np.floor(x))
            f = x - x0
            offs = np.array([-1, 0, 1, 2])
            wgts = keys_cubic(offs - f, a)
            for j, wgt in zip(x0 + offs, wgts):
                m[i, int(np.clip(j, 0, in_size - 1))] += wgt
        else:
            raise ValueError(f"unknown resize mode: {mode}")
    return m


def resize_matrix(out_size: int, in_size: int, mode: str) -> np.ndarray:
    """Public host-side accessor for the separable resample matrix."""
    return _interp_matrix_np(out_size, in_size, mode)


def _separable_resize(x: Array, out_hw: tuple[int, int], mode: str) -> Array:
    """Apply R_h @ img @ R_w^T over the H, W axes of (..., H, W, C)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    rh = jnp.asarray(_interp_matrix_np(h_out, h_in, mode), dtype=x.dtype)
    rw = jnp.asarray(_interp_matrix_np(w_out, w_in, mode), dtype=x.dtype)
    y = jnp.einsum("uh,...hwc->...uwc", rh, x)
    return jnp.einsum("vw,...hwc->...hvc", rw, y)


def resize_bicubic(x: Array, out_hw: tuple[int, int]) -> Array:
    """torch F.interpolate(mode='bicubic', align_corners=False) parity."""
    return _separable_resize(x, out_hw, "bicubic")


def resize_bilinear(x: Array, out_hw: tuple[int, int]) -> Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) parity."""
    return _separable_resize(x, out_hw, "bilinear")


def resize_area(x: Array, out_hw: tuple[int, int]) -> Array:
    """torch F.interpolate(mode='area') / adaptive average pool parity."""
    return _separable_resize(x, out_hw, "area")


def resize_bilinear_aa(x: Array, out_hw: tuple[int, int]) -> Array:
    """torch F.interpolate(mode='bilinear', antialias=True) parity — the
    reference resizes VSR++ flow inputs this way (unet.py:543-550)."""
    return _separable_resize(x, out_hw, "bilinear_aa")
