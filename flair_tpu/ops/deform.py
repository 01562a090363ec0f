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


def deform_conv2d_patch(
    x: Array,
    anchor_flow: Array,
    offset: Array,
    weight: Array,
    bias: Array | None = None,
    *,
    mask: Array | None = None,
    patch_size: int = 12,
    chunk: int = 16384,
    dilation: int = 1,
) -> Array:
    """Flow-anchored patch-gather DCNv2 — the fast TPU formulation.

    Motivation (measured on TPU v5e, see PERF.md): XLA's gather emitter moves
    ~1.3 elements/cycle for small (2,2,cg) slices — the exact tap-loop
    formulation costs ~870 ms at 512² — but runs at >120 GB/s when each
    gathered row is ≥128 contiguous bytes. FLAIR's deformable alignment
    (unet.py:598-661) computes ``offset = optical_flow + 10·tanh(residue)``
    where the *flow is shared* by all taps and by each half of the deform
    groups, so ONE (ps, ps, C/2)-channel patch per (pixel, group-half),
    anchored at floor(flow), covers every tap's bilinear corners whenever
    |residue| ≤ ps/2 - 2. The patch rows are Ca-channel contiguous (≥128 B),
    the per-tap bilinear then happens densely *inside* the patch on the VPU,
    and taps contract on the MXU.

    Semantics: identical to ``deform_conv2d`` (zero outside the image —
    dcn/src/deform_conv_cuda_kernel.cu boundary handling) for every sample
    whose residue |offset - anchor_flow| stays within the patch; samples
    falling outside the patch contribute ZERO (their bilinear window weights
    vanish), which mirrors the out-of-image behaviour rather than clamping.
    Exactness vs the gather path is therefore conditional on
    ``max|tanh residue| ≤ patch_size/2 - 2`` (patch 12 → ±4 px; FLAIR caps
    residues at ±10 via ``max_residue_magnitude``, so patch 26 would be
    unconditionally exact but memory-prohibitive — callers pick the mode).

    Args:
      x:           (B, H, W, Cin).
      anchor_flow: (B, H, W, A, 2) per-anchor base flow, (dy, dx); deform
                   groups are split into A contiguous blocks (FLAIR: A=2,
                   flow_1/flow_2), each anchored on its own flow.
      offset:      (B, H, W, G, K, 2) FULL sample offsets (flow + residue),
                   same convention as deform_conv2d.
      weight:      (3, 3, Cin, Cout) HWIO.
      mask:        optional (B, H, W, G, K) modulation.
      patch_size:  side of the gathered patch (even).
      chunk:       pixels per sequential chunk (bounds peak memory).

    Returns (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "patch path specialised to 3x3 kernels"
    g = offset.shape[3]
    a = anchor_flow.shape[3]
    kk = kh * kw
    ca = cin // a          # channels per anchor block
    ga = g // a            # deform groups per anchor block
    cg = cin // g
    ps = patch_size
    p_total = h * w
    gk = g * kk
    # chunk: bound the per-chunk patch buffer to ~0.5 GB, capped by the
    # caller's `chunk`, then rounded DOWN to the largest divisor of H*W so
    # every resolution (not just powers of two) is accepted
    budget = max(1, (1 << 28) // (a * ps * ps * ca))
    desired = max(1, min(p_total, budget, chunk))
    ch = 1
    d = 1
    while d * d <= p_total:
        if p_total % d == 0:
            if d <= desired:
                ch = max(ch, d)
            if p_total // d <= desired:
                ch = max(ch, p_total // d)
        d += 1
    n_chunks = p_total // ch

    cdt = jnp.float32
    base_y = jnp.arange(h, dtype=cdt)[None, :, None, None]
    base_x = jnp.arange(w, dtype=cdt)[None, None, :, None]
    ay = jnp.floor(base_y + anchor_flow[..., 0].astype(cdt)) - (ps // 2 - 1)
    ax = jnp.floor(base_x + anchor_flow[..., 1].astype(cdt)) - (ps // 2 - 1)

    pad = ps
    xh = jnp.pad(
        x.reshape(b, h, w, a, ca).transpose(0, 3, 1, 2, 4),
        ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)),
    )  # (B, A, H+2ps, W+2ps, Ca)
    iy = jnp.clip(ay.astype(jnp.int32) + pad, 0, h + 2 * pad - ps)
    ix = jnp.clip(ax.astype(jnp.int32) + pad, 0, w + 2 * pad - ps)
    iy_f = iy.transpose(0, 3, 1, 2).reshape(b, a, p_total)   # (B,A,P) small
    ix_f = ix.transpose(0, 3, 1, 2).reshape(b, a, p_total)

    # P-major single-coordinate planes: the (..., K, 2)-minor input layout
    # is tile-padded ~57x, so one strided read each here saves the per-chunk
    # relayout storm (profiled: ~140 ms of copies at 512^2)
    oy_f = offset[..., 0].reshape(b, p_total, gk)
    ox_f = offset[..., 1].reshape(b, p_total, gk)
    m_f = mask.reshape(b, p_total, gk) if mask is not None else None
    by_f = jnp.broadcast_to(base_y[..., 0], (b, h, w)).reshape(b, p_total)
    bx_f = jnp.broadcast_to(base_x[..., 0], (b, h, w)).reshape(b, p_total)
    ky = (jnp.repeat(jnp.arange(3), 3).astype(cdt) - 1.0) * dilation
    kx = (jnp.tile(jnp.arange(3), 3).astype(cdt) - 1.0) * dilation

    dn = lax.GatherDimensionNumbers(
        offset_dims=(3, 4, 5), collapsed_slice_dims=(),
        start_index_map=(2, 3),
        operand_batching_dims=(0, 1), start_indices_batching_dims=(0, 1),
    )
    # static window tables over the flattened (u, v) axis
    uv = jnp.arange(ps * ps, dtype=jnp.int32)
    u_tab = (uv // ps).astype(cdt)   # (ps*ps,)
    v_tab = (uv % ps).astype(cdt)

    # block-expanded weights: wk_blk[a][m=(h,k), E, e] carries weight[k, :, e]
    # for channel block h (zeros elsewhere) so the sample einsum can keep the
    # anchor's full Ca channel axis fused (layout stays unpadded)
    w_r = weight.astype(x.dtype).reshape(kk, a, ga, cg, cout)
    eyes = jnp.eye(ga, dtype=x.dtype)                    # (ga, ga)
    # wk_blk: (A, ga, kk, Ca, cout) with Ca = ga*cg
    wk_blk = jnp.einsum("kahde,hg->ahkgde", w_r, eyes).reshape(
        a, ga * kk, ca, cout
    )

    dtp = x.dtype
    prec = "highest" if dtp == jnp.float32 else None

    def body_impl(carry, i):
        p0 = i * ch
        iy_c = lax.dynamic_slice_in_dim(iy_f, p0, ch, axis=2)
        ix_c = lax.dynamic_slice_in_dim(ix_f, p0, ch, axis=2)
        oy_c = lax.dynamic_slice_in_dim(oy_f, p0, ch, axis=1)
        ox_c = lax.dynamic_slice_in_dim(ox_f, p0, ch, axis=1)
        by_c = lax.dynamic_slice_in_dim(by_f, p0, ch, axis=1)
        bx_c = lax.dynamic_slice_in_dim(bx_f, p0, ch, axis=1)
        idx = jnp.stack([iy_c, ix_c], axis=-1)
        patch = lax.gather(
            xh, idx, dn, slice_sizes=(1, 1, ps, ps, ca),
            mode=lax.GatherScatterMode.CLIP,
        ).reshape(b, a, ch, ps * ps, ca)
        # patch-relative sample coords (B,CH,G,K), then flat (B,CH,G*K)
        anc_y = jnp.repeat(jnp.swapaxes(iy_c, 1, 2), ga, axis=-1
                           ).astype(cdt) - pad
        anc_x = jnp.repeat(jnp.swapaxes(ix_c, 1, 2), ga, axis=-1
                           ).astype(cdt) - pad
        ky_flat = jnp.tile(ky, g)  # (G*K,) matching the flat (g, k) axis
        kx_flat = jnp.tile(kx, g)
        ry = (by_c[:, :, None] + ky_flat + oy_c.astype(cdt)
              - jnp.repeat(anc_y, kk, axis=-1))
        rx = (bx_c[:, :, None] + kx_flat + ox_c.astype(cdt)
              - jnp.repeat(anc_x, kk, axis=-1))
        # dense window weights on the flat (uv) axis; the relu window
        # auto-zeroes samples whose residue escaped the patch
        w2 = (jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - u_tab))
              * jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - v_tab)))
        if m_f is not None:
            m_c = lax.dynamic_slice_in_dim(m_f, p0, ch, axis=1)
            w2 = w2 * m_c[..., None].astype(cdt)
        w2 = w2.astype(dtp)  # (B, CH, G*K, ps*ps)
        out_c = 0
        for ai in range(a):
            w2_a = lax.slice_in_dim(w2, ai * ga * kk, (ai + 1) * ga * kk,
                                    axis=2)
            samp = jnp.einsum("bcmn,bcnE->bcmE", w2_a, patch[:, ai],
                              precision=prec)
            out_c = out_c + jnp.einsum("bcmE,mEe->bce", samp, wk_blk[ai],
                                       precision=prec)
        return carry, out_c

    # recompute the chunk (gather + window weights) in the backward pass:
    # saving w2/patches as residuals OOMs training even at small sizes
    # (scan-of-checkpoint; free when not differentiated)
    body = jax.checkpoint(body_impl, prevent_cse=False)
    _, outs = lax.scan(body, None, jnp.arange(n_chunks))
    out = jnp.moveaxis(outs, 0, 1).reshape(b, p_total, cout)
    out = out.reshape(b, h, w, cout)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
