"""Quality metrics harness: PSNR / SSIM (numpy) and LPIPS when available.

VERDICT r2 item 5: the reference's de-facto integration test is its demo
(scripts/demo.bash:4-10) judged by PSNR/LPIPS in the paper (arXiv
2311.15445); the repo itself ships no metric code. This module provides
the tooling to score restored frames against goldens each round.

CLI:  python tools/metrics.py <dirA> <dirB>
      → one JSON line {"psnr": dB, "ssim": ..., "lpips": ...|null, "n": N}
where dirA/dirB hold natural-sorted same-named PNG frames (or .npy stacks).

Library: psnr(a, b), ssim(a, b), lpips_dist(a, b) on float arrays in [0,1],
shape (..., H, W, C).
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 1.0) -> float:
    """Peak signal-to-noise ratio in dB over all leading dims."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def _filter2d_sep(img: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Separable 'valid' gaussian filter over the last two spatial dims of
    (N, H, W) image stacks."""
    from numpy.lib.stride_tricks import sliding_window_view

    k = w.shape[0]
    # rows
    v = sliding_window_view(img, k, axis=1)  # (N, H-k+1, W, k)
    v = np.tensordot(v, w, axes=([3], [0]))
    # cols
    v = sliding_window_view(v, k, axis=2)  # (N, H-k+1, W-k+1, k)
    return np.tensordot(v, w, axes=([3], [0]))


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 1.0,
         win_size: int = 11, sigma: float = 1.5) -> float:
    """Mean SSIM (Wang et al. 2004: 11-tap gaussian window σ=1.5,
    K1=0.01, K2=0.03), averaged over frames and channels.

    a, b: (..., H, W, C) in [0, data_range].
    """
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape and a.ndim >= 3
    h, wd, c = a.shape[-3:]
    a = a.reshape(-1, h, wd, c)
    b = b.reshape(-1, h, wd, c)
    # channels to batch: SSIM is computed per channel then averaged
    a = a.transpose(0, 3, 1, 2).reshape(-1, h, wd)
    b = b.transpose(0, 3, 1, 2).reshape(-1, h, wd)

    w = _gaussian_window(win_size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2

    mu_a = _filter2d_sep(a, w)
    mu_b = _filter2d_sep(b, w)
    mu_aa = _filter2d_sep(a * a, w)
    mu_bb = _filter2d_sep(b * b, w)
    mu_ab = _filter2d_sep(a * b, w)
    va = mu_aa - mu_a**2
    vb = mu_bb - mu_b**2
    vab = mu_ab - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * vab + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2)
    )
    return float(s.mean())


def lpips_dist(a: np.ndarray, b: np.ndarray):
    """LPIPS (AlexNet) if the `lpips` package is importable, else None.

    The package is not in this image (BASELINE.md: quality tables use
    PSNR/LPIPS; we substitute SSIM when LPIPS is unavailable)."""
    try:
        import lpips  # type: ignore
        import torch
    except ImportError:
        return None
    net = lpips.LPIPS(net="alex", verbose=False)
    ta = torch.from_numpy(
        np.asarray(a, np.float32).reshape(-1, *a.shape[-3:])
        .transpose(0, 3, 1, 2)) * 2 - 1
    tb = torch.from_numpy(
        np.asarray(b, np.float32).reshape(-1, *b.shape[-3:])
        .transpose(0, 3, 1, 2)) * 2 - 1
    with torch.no_grad():
        return float(net(ta, tb).mean())


def load_frames(path: str) -> np.ndarray:
    """Natural-sorted PNGs in a dir (or one .npy stack) → (T,H,W,3) [0,1].

    PNG directories load through the CLI's loader so scoring and serving
    can never disagree on frame ordering or color conversion."""
    p = Path(path)
    if p.suffix == ".npy":
        return np.asarray(np.load(p), np.float32)
    from flair_tpu.cli import load_frames as _cli_load

    return _cli_load(path)


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: python tools/metrics.py <dirA|a.npy> <dirB|b.npy>",
              file=sys.stderr)
        return 2
    a = load_frames(argv[0])
    b = load_frames(argv[1])
    if a.shape != b.shape:
        print(f"shape mismatch: {a.shape} vs {b.shape}", file=sys.stderr)
        return 2
    print(json.dumps({
        "psnr": round(psnr(a, b), 3),
        "ssim": round(ssim(a, b), 5),
        "lpips": lpips_dist(a, b),
        "n": int(a.shape[0]),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
