"""Modulated deformable convolution (DCNv2) as XLA gathers + MXU matmuls.

TPU-native replacement for the three CUDA deformable-conv paths of the
reference (SURVEY.md §2.2): the bundled ``dcn/`` extension
(dcn/src/deform_conv_cuda_kernel.cu:191-768), ``torchvision.ops.deform_conv2d``
(unet.py:652-661, unet_new.py:889-898) and mmcv's ``ModulatedDeformConv2d``.

Formulation: for each of the K = kh·kw kernel taps, the input is bilinearly
resampled at per-pixel, per-deform-group offset positions (4 gathers + VPU
blend), modulated by the sigmoid mask, then contracted against that tap's
weight slice with a single (B·H·W, Cin) @ (Cin, Cout) matmul — so all FLOPs
land on the MXU and the irregular work is K gathers, not a CUDA im2col.
Fully differentiable (autodiff through gathers), so training needs no custom
VJP. A fused Pallas kernel is a later optimisation once profiling justifies
it (SURVEY.md §7.3 item 1).

Convention: NHWC. ``offset`` is (B, H, W, G, K, 2) in (dy, dx) order and
``mask`` (B, H, W, G, K) — callers adapting torchvision's channel layout
(B, 2·G·K, H, W) should reshape to (..., G, K, 2), which matches its
(group, tap, coord) nesting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _bilinear_gather(img: Array, y: Array, x: Array) -> Array:
    """img (H, W, C); y/x float coords (...,). Zero outside bounds
    (matches the CUDA kernels' boundary handling)."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(iy, ix, wgt):
        v = img[jnp.clip(iy, 0, h - 1), jnp.clip(ix, 0, w - 1)]
        valid = ((iy >= 0) & (iy <= h - 1) & (ix >= 0) & (ix <= w - 1))[..., None]
        return jnp.where(valid, v, 0.0) * wgt

    return (
        tap(y0i, x0i, (1 - fy) * (1 - fx))
        + tap(y0i, x0i + 1, (1 - fy) * fx)
        + tap(y0i + 1, x0i, fy * (1 - fx))
        + tap(y0i + 1, x0i + 1, fy * fx)
    )


def deform_conv2d(
    x: Array,
    offset: Array,
    weight: Array,
    bias: Array | None = None,
    *,
    mask: Array | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    groups: int = 1,
) -> Array:
    """(Modulated) deformable conv2d.

    Args:
      x:      (B, H, W, Cin) input.
      offset: (B, Ho, Wo, G, K, 2) sample-point residuals, (dy, dx).
      weight: (kh, kw, Cin // groups, Cout) HWIO.
      mask:   optional (B, Ho, Wo, G, K) modulation (already sigmoided).
      groups: weight groups (conv groups, NOT deform groups G).

    Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    g = offset.shape[3]
    ho, wo = offset.shape[1], offset.shape[2]
    cg = cin // g

    base_y = jnp.arange(ho, dtype=x.dtype) * stride - padding
    base_x = jnp.arange(wo, dtype=x.dtype) * stride - padding
    gy = base_y[:, None]
    gx = base_x[None, :]

    xg = x.reshape(b, h, w, g, cg)

    out = None
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            sy = gy[None, :, :, None] + ky * dilation + offset[..., k, 0]
            sx = gx[None, :, :, None] + kx * dilation + offset[..., k, 1]
            # (B, Ho, Wo, G) coords → per-(batch, group) bilinear gather
            samp = jax.vmap(  # over batch
                jax.vmap(  # over deform groups
                    _bilinear_gather, in_axes=(2, 2, 2), out_axes=2
                ),
                in_axes=(0, 0, 0),
            )(xg, sy, sx)  # (B, Ho, Wo, G, cg)
            if mask is not None:
                samp = samp * mask[..., k, None]
            samp = samp.reshape(b, ho, wo, cin)
            wk = weight[ky, kx]  # (Cin//groups, Cout)
            if groups == 1:
                contrib = jnp.einsum(
                    "bhwc,cd->bhwd", samp, wk.astype(samp.dtype)
                )
            else:
                sg = samp.reshape(b, ho, wo, groups, cin // groups)
                wg = wk.reshape(groups * (cin // groups), cout)
                wgs = wg.reshape(groups, cin // groups, cout // groups)  # noqa: F841
                # torchvision groups semantics: weight (Cout, Cin/groups,..)
                # → HWIO slice per group
                wk3 = wk.astype(samp.dtype).reshape(
                    cin // groups, groups, cout // groups
                )
                contrib = jnp.einsum("bhwgc,cgd->bhwgd", sg, wk3).reshape(
                    b, ho, wo, cout
                )
            out = contrib if out is None else out + contrib
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def modulated_deform_conv2d(
    x: Array,
    offset: Array,
    mask: Array,
    weight: Array,
    bias: Array | None = None,
    **kwargs,
) -> Array:
    """DCNv2 (mmcv ModulatedDeformConv2d / bundled dcn extension parity)."""
    return deform_conv2d(x, offset, weight, bias, mask=mask, **kwargs)
