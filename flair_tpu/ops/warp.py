"""Grid sampling, optical-flow warping and affine warps as XLA gathers.

Replaces the CUDA ``grid_sample`` behind mmedit's ``flow_warp``
(used at unet.py:706-719 inside BasicVSRPP) and the host-side
``cv2.warpAffine`` face crop/paste (face_restoration_helper.py:203,232-254)
with batched bilinear/bicubic gathers that run on device, so face fusion can
live *inside* the jitted sampler step (SURVEY.md §7.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array


def _gather_2d(img: Array, iy: Array, ix: Array) -> Array:
    """img (H, W, C), iy/ix int32 (...,) → (..., C) with clamped indices."""
    h, w = img.shape[0], img.shape[1]
    iy = jnp.clip(iy, 0, h - 1)
    ix = jnp.clip(ix, 0, w - 1)
    return img[iy, ix]


def _sample_bilinear(img: Array, y: Array, x: Array, zero_pad: bool) -> Array:
    """Bilinear sample of img (H, W, C) at float coords y, x (...,).

    ``zero_pad`` True → out-of-bounds reads contribute 0 (grid_sample
    padding_mode='zeros'); False → edge clamp (padding_mode='border').
    """
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(iy, ix, wgt):
        v = _gather_2d(img, iy, ix)
        if zero_pad:
            valid = (
                (iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1)
            )[..., None]
            v = jnp.where(valid, v, 0.0)
        return v * wgt

    out = tap(y0i, x0i, (1 - fy) * (1 - fx))
    out += tap(y0i, x0i + 1, (1 - fy) * fx)
    out += tap(y0i + 1, x0i, fy * (1 - fx))
    out += tap(y0i + 1, x0i + 1, fy * fx)
    return out


def _keys_cubic_weights(f: Array, a: float = -0.75):
    """4-tap Keys cubic weights for fractional offset f in [0,1)."""
    f2 = f * f
    f3 = f2 * f
    w0 = a * (f3 - 2 * f2 + f)
    w1 = (a + 2) * f3 - (a + 3) * f2 + 1
    w2 = -(a + 2) * f3 + (2 * a + 3) * f2 - a * f
    w3 = a * (f2 - f3)
    return w0, w1, w2, w3


def _sample_bicubic(img: Array, y: Array, x: Array, zero_pad: bool) -> Array:
    """Bicubic (a=-0.75, cv2 INTER_CUBIC) sample of img (H, W, C)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = _keys_cubic_weights(y - y0)
    wx = _keys_cubic_weights(x - x0)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    out = None
    for dy in range(-1, 3):
        row = None
        for dx in range(-1, 3):
            v = _gather_2d(img, y0i + dy, x0i + dx)
            if zero_pad:
                valid = (
                    (y0i + dy >= 0)
                    & (y0i + dy <= h - 1)
                    & (x0i + dx >= 0)
                    & (x0i + dx <= w - 1)
                )[..., None]
                v = jnp.where(valid, v, 0.0)
            v = v * wx[dx + 1][..., None]
            row = v if row is None else row + v
        row = row * wy[dy + 1][..., None]
        out = row if out is None else out + row
    return out


def _bilinear_patch_batched(img: Array, y: Array, x: Array) -> Array:
    """Bilinear sample with zeros padding as ONE (2,2,C) patch gather.

    Four per-pixel single-pixel gathers hit XLA's slow gather-emitter class
    on TPU (small rows); one (2,2,C) patch per point keeps each gathered
    row ≥128 B contiguous — the fast path (PERF.md / mosaic-gather-limits).
    img (B, H, W, C); y/x (B, Ho, Wo) float coords. Out-of-image corners
    contribute zero (grid_sample padding_mode='zeros').
    """
    b, h, w, c = img.shape
    _, ho, wo = y.shape
    if 2 * c * img.dtype.itemsize < 128:
        # small-C images (e.g. the 3-channel face crops): the (2,2,C)
        # patch output puts C on the lane axis, and XLA's 128-lane padding
        # inflates the gather transient 128/C× — 21.5 GB at the face
        # paste's 2.6 M points (round-4 compile OOM). Per-tap sampling
        # is the slow-emitter class but bounded memory.
        return jax.vmap(
            lambda im, yy, xx: _sample_bilinear(im, yy, xx, True)
        )(img, y, x)
    cdt = jnp.float32
    y0 = jnp.floor(y.astype(cdt))
    x0 = jnp.floor(x.astype(cdt))
    fy = (y.astype(cdt) - y0)[..., None]
    fx = (x.astype(cdt) - x0)[..., None]
    wy0 = (1 - fy) * ((y0 >= 0) & (y0 <= h - 1))[..., None]
    wy1 = fy * ((y0 + 1 >= 0) & (y0 + 1 <= h - 1))[..., None]
    wx0 = (1 - fx) * ((x0 >= 0) & (x0 <= w - 1))[..., None]
    wx1 = fx * ((x0 + 1 >= 0) & (x0 + 1 <= w - 1))[..., None]

    xp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, h).reshape(b, ho * wo)
    ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, w).reshape(b, ho * wo)
    # pack the 4 taps into the gather minor axis (4 shifted copies — one
    # fused kernel): each point is ONE gather row of 4·C contiguous
    # elements. The direct (1,2,2,C) slice leaves C on the lane axis —
    # at C=64 bf16 that is a 2×-padded patch tensor (537 MB per 512²
    # feature warp) and 4 separate 128 B runs per point; packed rows are
    # 512 B, the tensor is exactly 4C lanes, and the relayout copy the
    # (2,2,C) layout forced on the weighted sum disappears (round-4
    # blur trace: 75.4 ms + 11.5 ms copy per scan site).
    im4 = jnp.stack(
        [xp[:, ky : ky + h + 1, kx : kx + w + 1, :]
         for ky in range(2) for kx in range(2)],
        axis=3,
    ).reshape(b, h + 1, w + 1, 4 * c)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    patch = lax.gather(
        im4, jnp.stack([iy, ix], axis=-1), dn, slice_sizes=(1, 1, 1, 4 * c),
        mode=lax.GatherScatterMode.CLIP,
    ).reshape(b, ho, wo, 2, 2, c)
    dt = img.dtype
    out = (patch[..., 0, 0, :] * (wy0 * wx0).astype(dt)
           + patch[..., 0, 1, :] * (wy0 * wx1).astype(dt)
           + patch[..., 1, 0, :] * (wy1 * wx0).astype(dt)
           + patch[..., 1, 1, :] * (wy1 * wx1).astype(dt))
    return out


def _bicubic_patch_batched(img: Array, y: Array, x: Array) -> Array:
    """Bicubic (Keys a=-0.75) sample with zeros padding as ONE (4,4,C)
    patch gather per output pixel.

    The tap-loop formulation (16 per-pixel single-element gathers) hits
    XLA's slow gather-emitter class — ~12 B rows for 3-channel images
    (PERF.md / mosaic-gather-limits); one whole (4,4,C) patch keeps the
    gathered rows contiguous. Out-of-image taps contribute zero: the
    operand is zero-padded by 3 so the 4×4 support of every coordinate
    whose support touches the image sits at an unclipped start index, and
    the per-tap bounds tests fold into the weights.

    img (B, H, W, C); y/x (B, Ho, Wo) float coords → (B, Ho, Wo, C).
    """
    b, h, w, c = img.shape
    _, ho, wo = y.shape
    if 4 * c * img.dtype.itemsize < 128:
        # see _bilinear_patch_batched: lane padding of the (4,4,C) patch
        # transient is 128/C× for small-C images. Instead of the per-tap
        # fallback (slow-emitter class, ~400 ms per face warp at 2.6 M
        # points) pre-pack the 16 taps into the minor axis so ONE gather
        # row carries the whole 4×4 support contiguously.
        return _bicubic_packed_small_c(img, y, x)
    cdt = jnp.float32
    y0 = jnp.floor(y.astype(cdt))
    x0 = jnp.floor(x.astype(cdt))
    wy = _keys_cubic_weights(y.astype(cdt) - y0)
    wx = _keys_cubic_weights(x.astype(cdt) - x0)
    wy = [wy[k] * ((y0 - 1 + k >= 0) & (y0 - 1 + k <= h - 1)) for k in range(4)]
    wx = [wx[k] * ((x0 - 1 + k >= 0) & (x0 - 1 + k <= w - 1)) for k in range(4)]

    xp = jnp.pad(img, ((0, 0), (3, 3), (3, 3), (0, 0)))
    # start = (y0 - 1) + 3 ∈ [0, h+2] exactly when the support touches the
    # image (y0 ∈ [-2, h]); fully-outside coords clip but their weights
    # are all zero
    iy = jnp.clip(y0.astype(jnp.int32) + 2, 0, h + 2).reshape(b, ho * wo)
    ix = jnp.clip(x0.astype(jnp.int32) + 2, 0, w + 2).reshape(b, ho * wo)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4), collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    patch = lax.gather(
        xp, jnp.stack([iy, ix], axis=-1), dn, slice_sizes=(1, 4, 4, c),
        mode=lax.GatherScatterMode.CLIP,
    ).reshape(b, ho, wo, 4, 4, c)
    # same accumulation order and dtype promotion as the tap-loop
    # (_sample_bicubic): v·wx summed over dx, then ·wy summed over dy
    out = None
    for dy in range(4):
        row = None
        for dx in range(4):
            v = patch[..., dy, dx, :] * wx[dx][..., None]
            row = v if row is None else row + v
        row = row * wy[dy][..., None]
        out = row if out is None else out + row
    return out


def _bicubic_packed_small_c(img: Array, y: Array, x: Array) -> Array:
    """Bicubic zeros-padding sample for small-C images via a packed-tap
    operand.

    The XLA gather emitter is fast only when each gathered row is ≥128 B
    contiguous (mosaic-gather-limits); a (4,4,C) patch of a 3-channel image
    has C-sized rows (12 B). Build ``im16[b, i, j, (ky·4+kx)·C + c] =
    xp[b, i+ky, j+kx, c]`` once (16 shifted copies — one fused kernel,
    16× image bytes), so every output point needs ONE gather whose row is
    the whole 16·C support (192 B at C=3 f32). Channels are zero-padded up
    so 16·C'·itemsize ≥ 128 (e.g. a C=1 f32 mask → C'=2). Numerics match
    the tap-loop exactly: identical tap values (zero padding ≡ the valid
    mask) and the same f32 accumulation order.
    """
    b, h, w, c = img.shape
    _, ho, wo = y.shape
    cp = max(c, -(-128 // (16 * img.dtype.itemsize)))
    if cp > c:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    cdt = jnp.float32
    y0 = jnp.floor(y.astype(cdt))
    x0 = jnp.floor(x.astype(cdt))
    wy = _keys_cubic_weights(y.astype(cdt) - y0)
    wx = _keys_cubic_weights(x.astype(cdt) - x0)
    wy = [wy[k] * ((y0 - 1 + k >= 0) & (y0 - 1 + k <= h - 1)) for k in range(4)]
    wx = [wx[k] * ((x0 - 1 + k >= 0) & (x0 - 1 + k <= w - 1)) for k in range(4)]

    xp = jnp.pad(img, ((0, 0), (3, 3), (3, 3), (0, 0)))
    # anchor range i ∈ [0, h+2] (see _bicubic_patch_batched)
    im16 = jnp.stack(
        [xp[:, ky : ky + h + 3, kx : kx + w + 3, :]
         for ky in range(4) for kx in range(4)],
        axis=3,
    ).reshape(b, h + 3, w + 3, 16 * cp)
    iy = jnp.clip(y0.astype(jnp.int32) + 2, 0, h + 2).reshape(b, ho * wo)
    ix = jnp.clip(x0.astype(jnp.int32) + 2, 0, w + 2).reshape(b, ho * wo)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(1, 2),
        start_index_map=(1, 2),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,),
    )
    patch = lax.gather(
        im16, jnp.stack([iy, ix], axis=-1), dn,
        slice_sizes=(1, 1, 1, 16 * cp),
        mode=lax.GatherScatterMode.CLIP,
    ).reshape(b, ho, wo, 4, 4, cp)[..., :c]
    # same accumulation order and dtype promotion as the tap-loop
    out = None
    for dy in range(4):
        row = None
        for dx in range(4):
            v = patch[..., dy, dx, :] * wx[dx][..., None]
            row = v if row is None else row + v
        row = row * wy[dy][..., None]
        out = row if out is None else out + row
    return out


def grid_sample(
    img: Array,
    grid: Array,
    *,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> Array:
    """torch.nn.functional.grid_sample parity, NHWC.

    ``img`` (B, H, W, C); ``grid`` (B, Ho, Wo, 2) with normalized coords in
    [-1, 1], grid[..., 0] = x, grid[..., 1] = y.
    """
    h, w = img.shape[1], img.shape[2]
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        x = (gx + 1) * (w - 1) / 2
        y = (gy + 1) * (h - 1) / 2
    else:
        x = ((gx + 1) * w - 1) / 2
        y = ((gy + 1) * h - 1) / 2
    zero_pad = padding_mode == "zeros"
    if mode == "bilinear" and zero_pad and grid.ndim == 4:
        return _bilinear_patch_batched(img, y, x)
    if mode == "bicubic" and zero_pad and grid.ndim == 4:
        return _bicubic_patch_batched(img, y, x)
    sampler = {
        "bilinear": _sample_bilinear,
        "nearest": lambda im, yy, xx, zp: _gather_2d(
            im, jnp.round(yy).astype(jnp.int32), jnp.round(xx).astype(jnp.int32)
        ),
        "bicubic": _sample_bicubic,
    }[mode]
    return jax.vmap(lambda im, yy, xx: sampler(im, yy, xx, zero_pad))(img, y, x)


def flow_warp(
    x: Array,
    flow: Array,
    *,
    interpolation: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> Array:
    """Warp NHWC ``x`` (B, H, W, C) by pixel-displacement ``flow``
    (B, H, W, 2), flow[..., 0] = dx — or a tuple ``(fdx, fdy)`` of two
    (B, H, W) component planes, which skips the lane-minor stack the
    array form costs upstream AND the strided component re-slice the
    samplers pay downstream (each ~8 ms/step of async DMA inside the
    VSR++ scans at 512², round-4 trace). mmedit ``flow_warp`` parity
    (used by BasicVSRPP at unet.py:449-492, unet_new.py:706-719)."""
    b, h, w, _ = x.shape
    if isinstance(flow, (tuple, list)):
        fdx, fdy = flow
    else:
        fdx, fdy = flow[..., 0], flow[..., 1]
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=fdx.dtype),
        jnp.arange(w, dtype=fdx.dtype),
        indexing="ij",
    )
    vx = gx[None] + fdx
    vy = gy[None] + fdy
    # normalize to [-1, 1] (align_corners=True convention, as mmedit does)
    nx = 2.0 * vx / jnp.maximum(w - 1, 1) - 1.0
    ny = 2.0 * vy / jnp.maximum(h - 1, 1) - 1.0
    if interpolation in ("bilinear", "bicubic") and padding_mode == "zeros":
        # feed the patch samplers directly — same denormalization ops
        # grid_sample applies, minus the grid stack + component re-slice
        if align_corners:
            px = (nx + 1) * (w - 1) / 2
            py = (ny + 1) * (h - 1) / 2
        else:
            px = ((nx + 1) * w - 1) / 2
            py = ((ny + 1) * h - 1) / 2
        sampler = (_bilinear_patch_batched if interpolation == "bilinear"
                   else _bicubic_patch_batched)
        return sampler(x, py, px)
    grid = jnp.stack([nx, ny], axis=-1)
    return grid_sample(
        x,
        grid,
        mode=interpolation,
        padding_mode=padding_mode,
        align_corners=align_corners,
    )


def inverse_affine_matrix(m: np.ndarray) -> np.ndarray:
    """Invert a 2x3 affine matrix (host-side; cv2.invertAffineTransform)."""
    a = np.eye(3, dtype=np.float64)
    a[:2] = m
    inv = np.linalg.inv(a)
    return inv[:2].astype(np.float64)


def warp_affine(
    img: Array,
    matrix: Array,
    out_hw: tuple[int, int],
    *,
    mode: str = "bilinear",
    border_value: float = 0.0,
) -> Array:
    """cv2.warpAffine parity on device: for each output pixel (xo, yo),
    sample input at M^{-1} @ (xo, yo, 1).

    ``img`` (B, H, W, C); ``matrix`` (B, 2, 3) is the *forward* src→dst map
    (as cv2 takes it); pass the already-inverted matrix with mode='inverse_*'
    semantics by calling :func:`inverse_affine_matrix` on host. Out-of-bounds
    pixels take ``border_value`` (BORDER_CONSTANT).
    """
    ho, wo = out_hw
    # invert on device: [[a,b,c],[d,e,f]] → inverse affine
    a, b, c = matrix[:, 0, 0], matrix[:, 0, 1], matrix[:, 0, 2]
    d, e, f = matrix[:, 1, 0], matrix[:, 1, 1], matrix[:, 1, 2]
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)

    gy, gx = jnp.meshgrid(
        jnp.arange(ho, dtype=img.dtype),
        jnp.arange(wo, dtype=img.dtype),
        indexing="ij",
    )

    # batched sample coordinates (B, Ho, Wo)
    sx = ia[:, None, None] * gx + ib[:, None, None] * gy + ic[:, None, None]
    sy = id_[:, None, None] * gx + ie[:, None, None] * gy + if_[:, None, None]
    h, w = img.shape[1], img.shape[2]
    # one (2,2|4,4,C) patch gather per pixel — the fast emitter shape; the
    # per-tap loops (4|16 single-element gathers) are the slow class
    if mode == "bilinear":
        v = _bilinear_patch_batched(img, sy, sx)
    elif mode == "bicubic":
        v = _bicubic_patch_batched(img, sy, sx)
    else:
        raise ValueError(mode)
    inb = (sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5)
    return jnp.where(inb[..., None], v, border_value)
