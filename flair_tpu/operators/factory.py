"""Per-task degradation operator + restore_fn construction.

Mirrors the demo CLI wiring (scripts/video_sample.py:177-263):
- x8/x16_bicubic → SRConv with an a=-0.5 bicubic kernel of length 4·factor.
- gaussian/jpeg  → PseudoSR with the 25×25 blur kernel (kernels_12.mat cell
  [0,3], bundled as flair_tpu/assets/blur_kernels.npz), kernel_indx=10.

``make_restore_fn`` returns the x0-space correction closure used by the
guided sampler (gaussian_diffusion.py:465-470): for bicubic tasks
A⁺(A(x) − y); for gaussian/jpeg the null-space correction A⁺A(x) − A⁺(y)
with optional JPEG round-trip.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pseudo_sr import PseudoSR, get_pseudo_sr_conf
from .svd_ops import SRConv

Array = jax.Array

_ASSET_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "assets")


def bicubic_kernel_1d(factor: int, a: float = -0.5) -> np.ndarray:
    """Length-4·factor bicubic antialiasing kernel sampled at half-pixel
    offsets (scripts/video_sample.py:210-224), normalised to sum 1."""
    i = np.arange(factor * 4, dtype=np.float64)
    x = (1.0 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
    ax = np.abs(x)
    k = np.where(
        ax <= 1,
        (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a, 0.0),
    )
    return k / k.sum()


def load_blur_kernel(index: int = 3) -> np.ndarray:
    """Demo blur kernel (miscs/kernels_12.mat cell [0, index], 25×25)."""
    data = np.load(os.path.join(_ASSET_DIR, "blur_kernels.npz"))
    return np.asarray(data[f"k{index}"], np.float64)


def get_operator(task: str, img_dim: int = 512):
    """Build the task's A-operator (scripts/video_sample.py:205-263)."""
    if task in ("x8_bicubic", "x16_bicubic"):
        factor = 8 if task == "x8_bicubic" else 16
        return SRConv(
            bicubic_kernel_1d(factor), channels=3, img_dim=img_dim, stride=factor
        )
    if task in ("gaussian", "jpeg"):
        conf = get_pseudo_sr_conf(4)
        return PseudoSR(conf, blur_kernel=load_blur_kernel(3), kernel_indx=10)
    raise ValueError(f"unknown task: {task}")


def make_restore_fn(
    task: str,
    operator,
    degraded: Array,
    jpeg_qf: int = -1,
) -> Callable[[Array], Array]:
    """x0-space data-consistency correction closure.

    ``degraded``: the observed LR frames, NHWC, flattened per call.
    x0 enters as (N, H, W, C) in [-1, 1]; the returned correction has the
    same shape (gaussian_diffusion.py:465-470 subtracts γ·correction).
    """
    if task in ("x8_bicubic", "x16_bicubic"):
        d_flat = degraded.reshape(degraded.shape[0], -1)

        def restore(x0: Array) -> Array:
            n = x0.shape[0]
            flat = x0.reshape(n, -1)
            resid = operator.A(flat) - d_flat
            return operator.A_pinv(resid).reshape(x0.shape)

        return restore

    if task in ("gaussian", "jpeg"):
        qf = jpeg_qf if task == "jpeg" else None
        if task == "jpeg" and jpeg_qf == -1:
            qf = None

        def restore(x0: Array) -> Array:
            return operator.A_pinv(degraded, x0, jpeg_qf=qf)

        return restore

    raise ValueError(f"unknown task: {task}")


def make_restore_fn_p(
    task: str,
    operator,
    jpeg_qf: int = -1,
) -> Callable[[Array, Array], Array]:
    """Parameterised variant of :func:`make_restore_fn`: the observed LR
    frames enter per CALL instead of being baked into the closure.

    Needed by the two-program (steps) sampler: closures binding per-window
    data would force a retrace — and a multi-minute XLA recompile — of the
    guidance-update program for every window; with ``degraded`` as a runtime
    argument one compiled program serves the whole clip.

    ``restore(x0, degraded)``: x0 (N, H, W, C) in [-1, 1]; ``degraded`` the
    per-window observations, (N, h', w', C) for SR tasks / (N, h', w', C)
    for gaussian/jpeg — same convention as :func:`make_restore_fn`.
    """
    if task in ("x8_bicubic", "x16_bicubic"):

        def restore(x0: Array, degraded: Array) -> Array:
            n = x0.shape[0]
            flat = x0.reshape(n, -1)
            resid = operator.A(flat) - degraded.reshape(n, -1)
            return operator.A_pinv(resid).reshape(x0.shape)

        return restore

    if task in ("gaussian", "jpeg"):
        qf = jpeg_qf if task == "jpeg" else None
        if task == "jpeg" and jpeg_qf == -1:
            qf = None

        def restore(x0: Array, degraded: Array) -> Array:
            return operator.A_pinv(degraded, x0, jpeg_qf=qf)

        return restore

    raise ValueError(f"unknown task: {task}")
