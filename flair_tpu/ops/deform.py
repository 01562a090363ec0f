"""Modulated deformable convolution (DCNv2) as XLA patch-gathers + MXU matmuls.

TPU-native replacement for the three CUDA deformable-conv paths of the
reference (SURVEY.md §2.2): the bundled ``dcn/`` extension
(dcn/src/deform_conv_cuda_kernel.cu:191-768), ``torchvision.ops.deform_conv2d``
(unet.py:652-661, unet_new.py:889-898) and mmcv's ``ModulatedDeformConv2d``.

Formulation (profiled on TPU v5e; see bench notes in PERF.md): for each
kernel tap, ONE ``lax.gather`` fetches the full 2×2 bilinear patch per sample
point (``slice_sizes=(2, 2, cg)``, batched over (batch, deform-group)), the
four corners are blended on the VPU with out-of-bounds corners zeroed
(CUDA-kernel boundary semantics), modulated by the sigmoid mask, and all
taps are contracted against the weight with a single
(B·H·W, K·Cin) @ (K·Cin, Cout) einsum on the MXU. The tap loop keeps the
peak gather buffer at (B, G, Ho·Wo, 2, 2, cg) — bounded even at 512².

Fully differentiable (autodiff through gathers), so training needs no custom
VJP.

Convention: NHWC. ``offset`` is (B, H, W, G, K, 2) in (dy, dx) order and
``mask`` (B, H, W, G, K) — callers adapting torchvision's channel layout
(B, 2·G·K, H, W) should reshape to (..., G, K, 2), which matches its
(group, tap, coord) nesting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def _gather_patches(xp: Array, iy: Array, ix: Array, cg: int) -> Array:
    """Fetch (2, 2, cg) patches at integer starts from the zero-padded input.

    xp: (B, G, H+2, W+2, cg); iy/ix: (B, G, P) starts into the padded image.
    Returns (B, G, P, 2, 2, cg).
    """
    idx = jnp.stack([iy, ix], axis=-1)
    dn = lax.GatherDimensionNumbers(
        offset_dims=(3, 4, 5),
        collapsed_slice_dims=(),
        start_index_map=(2, 3),
        operand_batching_dims=(0, 1),
        start_indices_batching_dims=(0, 1),
    )
    return lax.gather(
        xp, idx, dn, slice_sizes=(1, 1, 2, 2, cg),
        mode=lax.GatherScatterMode.CLIP,
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
    kk = kh * kw
    cg = cin // g

    # coordinates stay f32 regardless of the value dtype: bf16 cannot
    # resolve integer pixel positions past 256
    cdt = jnp.float32
    base_y = (jnp.arange(ho, dtype=cdt) * stride - padding)[
        None, :, None, None
    ]  # (1, Ho, 1, 1)
    base_x = (jnp.arange(wo, dtype=cdt) * stride - padding)[
        None, None, :, None
    ]  # (1, 1, Wo, 1)
    ky = jnp.repeat(jnp.arange(kh) * dilation, kw).astype(cdt)  # (K,)
    kx = jnp.tile(jnp.arange(kw) * dilation, kh).astype(cdt)

    # zero-pad by 1 so patch starts land in-bounds; clamp the rest (their
    # contributions are zeroed by the validity weights below)
    xp = jnp.pad(
        x.reshape(b, h, w, g, cg).transpose(0, 3, 1, 2, 4),
        ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
    )

    wk = weight.astype(x.dtype).reshape(kk, cin // groups, cout)

    def tap(k, acc):
        # per-tap coords computed inside the (sequential) loop so only ONE
        # tap's gather buffers are live at a time, and the tap's MXU
        # contraction is accumulated directly into the (B, Ho, Wo, Cout)
        # output — the full-size flagship step OOMs by ~1 GB otherwise
        sy = base_y + ky[k] + offset[..., k, 0].astype(cdt)
        sx = base_x + kx[k] + offset[..., k, 1].astype(cdt)
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = sy - y0
        fx = sx - x0
        # corner validity (zero outside the image, CUDA-kernel semantics)
        wy0 = (1 - fy) * ((y0 >= 0) & (y0 <= h - 1))
        wy1 = fy * ((y0 + 1 >= 0) & (y0 + 1 <= h - 1))
        wx0 = (1 - fx) * ((x0 >= 0) & (x0 <= w - 1))
        wx1 = fx * ((x0 + 1 >= 0) & (x0 + 1 <= w - 1))

        iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
        ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
        iy = iy.transpose(0, 3, 1, 2).reshape(b, g, ho * wo)
        ix = ix.transpose(0, 3, 1, 2).reshape(b, g, ho * wo)
        patches = _gather_patches(xp, iy, ix, cg)
        patches = patches.reshape(b, g, ho, wo, 2, 2, cg).transpose(
            0, 2, 3, 1, 4, 5, 6
        )  # (B, Ho, Wo, G, 2, 2, cg)
        val = (
            patches[..., 0, 0, :] * (wy0 * wx0).astype(x.dtype)[..., None]
            + patches[..., 0, 1, :] * (wy0 * wx1).astype(x.dtype)[..., None]
            + patches[..., 1, 0, :] * (wy1 * wx0).astype(x.dtype)[..., None]
            + patches[..., 1, 1, :] * (wy1 * wx1).astype(x.dtype)[..., None]
        )  # (B, Ho, Wo, G, cg)
        if mask is not None:
            val = val * mask[..., k, None].astype(x.dtype)
        val = val.reshape(b, ho, wo, cin)
        if groups == 1:
            contrib = jnp.einsum("bhwc,cd->bhwd", val, wk[k])
        else:
            vg = val.reshape(b, ho, wo, groups, cin // groups)
            wg = wk[k].reshape(cin // groups, groups, cout // groups)
            contrib = jnp.einsum("bhwgc,cgd->bhwgd", vg, wg).reshape(
                b, ho, wo, cout
            )
        return acc + contrib

    out = lax.fori_loop(
        0, kk, tap, jnp.zeros((b, ho, wo, cout), x.dtype)
    )
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
