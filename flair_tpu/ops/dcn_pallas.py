"""Tile-anchored modulated deformable conv — Pallas TPU kernel.

The fast path for FLAIR's SecondOrderDeformableAlignment
(reference unet.py:598-661, dcn/src/deform_conv_cuda_kernel.cu:191-768).

Why a kernel (profiled on v5e, PERF.md): the XLA per-pixel patch-gather
formulation (``ops/deform.deform_conv2d_patch``) is bound by three HBM
round-trips proportional to P·ps²·Ca — the gather emitter writes ~13 GB at
~93 GB/s (329 ms/call at 512²). Flow is *smooth*, so neighbouring pixels'
patches overlap almost entirely: this kernel shares ONE patch per small
pixel tile (anchor = floor(min tile flow) − margin), fetched by the DMA
engine at near-HBM bandwidth, and builds the per-(pixel, group, tap)
bilinear window weights ``relu(1−|ry−u|)·relu(1−|rx−v|)`` entirely in
VMEM — the P·G·K·uv window tensor never touches HBM. The window then
contracts on the MXU against the gathered patch (per tile) and the conv
weight (per tap, batched across the step's tiles).

Layout rules this kernel is built around (probed limits in
memory/mosaic-gather-limits):
- window weights live transposed, (uv rows, (k,pixel,group) lanes), so the
  per-(pixel,tap) coordinates arrive lane-major — no sublane↔lane
  relayouts anywhere in the hot loop;
- PTX is a multiple of 16 and Ca ≤ 128, so (PTY, PTX, Ca) → (PTY·PTX, Ca)
  patch reshapes are bf16-tile exact (free);
- the uv expansion is sublane-broadcast + leading-collapse (no
  jnp.repeat gathers);
- modulation folds into the y-window build; deform-group channel masking
  is one static (rows, Ca) multiply on the small sampled tensor.

Semantics: identical to ``ops.deform.deform_conv2d`` (zero outside the
image) for every sample whose bilinear support lands inside its tile's
patch; escaping samples contribute zero — the same conditional-exactness
contract as ``deform_conv2d_patch``, except the budget also covers the
intra-tile flow spread (quantify with ``tile_escape_fraction``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _dcn_tile_kernel(
    anchors_ref,      # (1, NTB*A*3) int32 SMEM: (b, ay, ax) per (tile, a)
    anchors_nxt_ref,  # same array, block i+1 (DMA lookahead)
    scale_ref,        # (1, 1) f32 SMEM: int8 dequant factor (1.0 if bf16)
    ry_ref,           # (1, NTB*A, R) f32; R = KK*TPIX*GA lanes, (k, p, g)
    rx_ref,           # (1, NTB*A, R) f32
    mw_ref,           # (1, NTB*A, R) f32 modulation (1.0 if unmasked)
    xh_ref,           # (B*A, Hp, Wp/XP, 128) bf16|int8 ANY/HBM (x-packed)
    wall_ref,         # (A*KK, 128, Cout) bf16 VMEM (parity-duplicated)
    out_ref,          # (1, NPIXB, Cout)
    patch_ref,        # (2, NTB, A, PTY, PTXP, 128) VMEM scratch
    samp_ref,         # (NTB2, R, 128) bf16 VMEM scratch
    acc_ref,          # (NPIXB, Cout) f32 VMEM scratch
    sem_ref,          # DMA sems (2, NTB, A)
    *,
    ntb: int, a: int, ga: int, kk: int, pty: int, ptx: int, xpack: int,
    ca: int, cg: int, cout: int, tpix: int, n_steps: int, ablate: str = "",
    lane_slice: bool = False, bc: int = 0, ntb2: int = 0,
    int8_dots: bool = False,
):
    i = pl.program_id(0)
    r = kk * tpix * ga
    kb = tpix * ga            # rows per tap block
    ptxp = ptx // xpack       # packed patch columns
    uvp = pty * ptxp
    bc = bc or r              # window-build chunk (R lanes per dot1)
    ntb2 = ntb2 or ntb        # tiles per tap-contraction sub-batch

    nodma = ablate in ("nodma", "empty")

    def dma(buf, t, ai, aref):
        base = (t * a + ai) * 3
        return pltpu.make_async_copy(
            xh_ref.at[aref[0, 0, base], pl.ds(aref[0, 0, base + 1], pty),
                      pl.ds(pl.multiple_of(aref[0, 0, base + 2], 8), ptxp),
                      :],
            patch_ref.at[buf, t, ai],
            sem_ref.at[buf, t, ai],
        )

    if not nodma:
        @pl.when(i == 0)
        def _():
            for t in range(ntb):
                for ai in range(a):
                    dma(0, t, ai, anchors_ref).start()

        @pl.when(i + 1 < n_steps)
        def _():
            for t in range(ntb):
                for ai in range(a):
                    dma((i + 1) % 2, t, ai, anchors_nxt_ref).start()

    buf = i % 2

    # static group mask: row (k, p, g) uses only channels of group g;
    # lane j = parity·Ca + c (or plain c when lane-sliced)
    sw = ca if lane_slice else 128
    row_g = lax.broadcasted_iota(jnp.int32, (r, sw), 0) % ga
    col_g = (lax.broadcasted_iota(jnp.int32, (r, sw), 1) % ca) // cg
    gmask = (row_g == col_g).astype(jnp.bfloat16)
    lane_par = lax.broadcasted_iota(jnp.int32, (r, sw), 1) // ca  # 0/1

    # separable window build: wy has only PTY distinct row values and wx
    # only PTXP — build both small and expand to (UVP, bc) via sublane /
    # leading broadcasts + collapse (free in Mosaic), so the only
    # UVP-sized VPU ops are the product and the bf16 cast
    # (Mosaic requires integer iota results; cast after)
    u_small = lax.broadcasted_iota(jnp.int32, (pty, 1), 0).astype(
        jnp.float32)                                              # (PTY,1)
    v_small = lax.broadcasted_iota(jnp.int32, (ptxp, 1), 0)       # (PTXP,1)

    if ablate == "empty":
        probe = (ry_ref[0, 0:1, 0:cout] + rx_ref[0, 0:1, 0:cout]
                 + mw_ref[0, 0:1, 0:cout])
        out_ref[0] = jnp.broadcast_to(
            probe, (ntb * tpix, cout)).astype(out_ref.dtype)
        return

    # wait for the whole step's patches BEFORE any compute: a semaphore
    # wait between compute units serializes the scheduler — with all waits
    # hoisted, the per-unit VPU window builds and MXU dots can overlap
    if not nodma:
        for t in range(ntb):
            for ai in range(a):
                dma(buf, t, ai, anchors_ref).wait()

    # chunking (VMEM): the window build's (UVP, bc) temporaries and the
    # (NTB2, R, SW) samp scratch are the kernel's two size-scaling
    # allocations — bc chunks the build over R lanes, ntb2 sub-batches the
    # tap contraction over tiles, so large tiles/patches stay under the
    # 16 MiB scoped-VMEM limit. Results are bit-identical: chunk rows of
    # samp are disjoint, and the tap contraction accumulates per sub-batch
    # into disjoint f32 acc rows.
    for ai in range(a):
        for tb in range(ntb // ntb2):
            for tt in range(ntb2):
                t = tb * ntb2 + tt
                s = t * a + ai
                patch = patch_ref[buf, t, ai].reshape(uvp, 128)
                for rc in range(0, r, bc):
                    ry = ry_ref[0, s, rc:rc + bc][None, :]   # (1, bc)
                    rx = rx_ref[0, s, rc:rc + bc][None, :]
                    mw = mw_ref[0, s, rc:rc + bc][None, :]
                    if ablate != "nobuild":
                        wy_s = jnp.maximum(
                            0.0, 1.0 - jnp.abs(ry - u_small)) * mw
                        wy = jnp.broadcast_to(
                            wy_s[:, None, :], (pty, ptxp, bc)
                        ).reshape(uvp, bc)               # rows (u, colp)
                    dots = []
                    for par in range(xpack if ablate != "onedot" else 1):
                        rhs = (patch[:, par * ca:(par + 1) * ca]
                               if lane_slice and xpack > 1 else patch)
                        if ablate == "nobuild":
                            w2 = jnp.broadcast_to(
                                patch[:, 0:1], (uvp, bc)).astype(jnp.bfloat16)
                        else:
                            # w2[(u·PTXP+colp), rc] =
                            #   relu(1-|ry-u|)·relu(1-|rx-v|)·m
                            v_row = (v_small * xpack + par).astype(
                                jnp.float32)             # (PTXP, 1)
                            wx = jnp.broadcast_to(
                                jnp.maximum(
                                    0.0, 1.0 - jnp.abs(rx - v_row)
                                )[None], (pty, ptxp, bc)).reshape(uvp, bc)
                            if int8_dots:
                                # w2 ∈ [0,1]: fixed-scale int8 (exact zero
                                # stays zero; ±1/254 absolute on the ≤4
                                # nonzero bilinear weights per row)
                                w2 = jnp.round(
                                    (wy * wx) * 127.0).astype(jnp.int8)
                            else:
                                w2 = (wy * wx).astype(jnp.bfloat16)
                        dots.append(lax.dot_general(
                            w2, rhs, (((0,), (0,)), ((), ())),
                            preferred_element_type=(
                                jnp.int32 if int8_dots and
                                ablate != "nobuild" else jnp.float32),
                        ))  # (bc, SW); sans lane_slice only par's Ca valid
                    if xpack == 1 or ablate == "onedot":
                        samp = dots[0]
                    elif lane_slice:
                        samp = dots[0] + dots[1]
                    else:
                        samp = jnp.where(
                            lane_par[rc:rc + bc] == 0, dots[0], dots[1])
                    if int8_dots and ablate != "nobuild":
                        # dequant: value scale · window scale (1/127 each)
                        samp = samp.astype(jnp.float32) * scale_ref[0, 0]
                    samp_ref[tt, rc:rc + bc, :] = (
                        samp.astype(jnp.bfloat16) * gmask[rc:rc + bc])

            # taps contract against the full conv weight, batched over the
            # sub-batch's tiles; disjoint acc rows per (tb)
            rows = slice(tb * ntb2 * tpix, (tb + 1) * ntb2 * tpix)
            for k in range(kk):
                x_k = samp_ref[:, k * kb:(k + 1) * kb, :].reshape(
                    ntb2 * kb, sw)
                y_k = lax.dot_general(
                    x_k, wall_ref[ai * kk + k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (NTB2*KB, Cout)
                y_k = y_k.reshape(ntb2 * tpix, ga, cout).sum(axis=1)
                if ai == 0 and k == 0:
                    acc_ref[rows] = y_k
                else:
                    acc_ref[rows] = acc_ref[rows] + y_k
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile", "patch", "ntb", "dilation", "interpret",
                     "ablate", "lane_slice", "build_chunk", "ntb2",
                     "raw_mrm", "int8_dots"),
)
def deform_conv2d_tile(
    x: Array,
    anchor_flow: Array,
    offset: Array,
    weight: Array,
    bias: Array | None = None,
    *,
    mask: Array | None = None,
    raw: tuple | None = None,
    raw_mrm: float = 0.0,
    tile: tuple[int, int] = (2, 2),
    patch: tuple[int, int] = (14, 32),
    ntb: int = 16,
    dilation: int = 1,
    interpret: bool = False,
    ablate: str = "",
    lane_slice: bool = False,
    build_chunk: int | None = None,
    ntb2: int | None = None,
    int8_dots: bool = False,
) -> Array:
    """Tile-anchored DCNv2 (Pallas). API matches ``deform_conv2d_patch``.

    Args:
      x:           (B, H, W, Cin); computed in bf16.
      anchor_flow: (B, H, W, A, 2) per-anchor base flow, (dy, dx); deform
                   groups split into A contiguous blocks (FLAIR: A=2).
      offset:      FULL sample offsets (flow + residue): either a stacked
                   (B, H, W, G, K, 2) array, or a tuple (oy, ox) of two
                   (B, H, W, G, K) — or channel-flat (B, H, W, G·K),
                   group-major — arrays. The split form skips the stack +
                   two stride-2 slices (~0.9 GB HBM round-trips per 512²
                   call) the stacked form costs upstream; the FLAT form
                   additionally avoids XLA's K=9-minor padded layout
                   (a 32 ms normalization copy + 30 ms tiled reshape per
                   tensor per 512² call, round-4 trace).
      weight:      (3, 3, Cin, Cout) HWIO (conv groups = 1).
      mask:        optional (B, H, W, G, K) or flat (B, H, W, G·K)
                   modulation (sigmoided).
      raw:         optional PRE-ACTIVATION prep inputs, replacing
                   offset+mask entirely: (res_y, res_x, mask_logits,
                   flow_y, flow_x) where res_*/mask_logits are the
                   offset-conv output channel blocks (B, H, W, G·K) in
                   their compute dtype (bf16 on TPU) and flow_* are
                   (B, H, W, A) f32 per-anchor base flows. The lane
                   permute then rides the RAW values — a single-pass
                   bf16 one-hot dot instead of an f32 Precision.HIGH
                   (bf16_3x) dot — and ``mrm·tanh(·) + flow + table``
                   happens in lane space where it fuses with the
                   existing iota-table adds. Same per-element op order as
                   the materialized-offset path: bit-identical in
                   interpret mode; on TPU, XLA fusion/FMA contraction
                   differences leave ≤1 bf16-ulp output deltas (~13% of
                   elements, measured numerically neutral vs the exact
                   path).
      raw_mrm:     max_residue_magnitude for the ``raw`` path (static).
      tile:        (TY, TX) pixels sharing one patch anchor.
      patch:       (PTY, PTX); PTX % 16 == 0, PTY*PTX covering
                   tile span + 2·max_residue + 4 + flow spread.
      ntb:         tiles per grid step (DMA batch).
      build_chunk: R lanes per window-build/dot1 chunk (multiple of
                   TPIX·GA dividing R); None → largest under ~3 MiB of
                   build temporaries. Bounds scoped VMEM for big tiles.
      ntb2:        tiles per tap-contraction sub-batch (divides ntb);
                   None → largest with samp scratch ≤ ~4 MiB.
      int8_dots:   execute the window dots at the MXU's int8 rate (2× the
                   bf16 quantum on v5e): the value operand is quantized
                   once per call against its global max (symmetric, ±127)
                   and the in-kernel window weights (∈ [0,1], exact zeros
                   preserved) ride a fixed 1/127 scale into an int32
                   accumulation, dequantized before the bf16 tap
                   contraction. Accuracy vs the bf16 dots is an extra
                   ~0.5-1% relative sampling error (measured in
                   tools/probe_int8.py / PERF.md round 5); the exactness
                   contract (escape zeroing) is unchanged.

    Returns (B, H, W, Cout) in x.dtype.
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    assert (kh, kw) == (3, 3), "specialised to 3x3 kernels"
    kk = kh * kw
    if raw is not None:
        assert offset is None and mask is None
        oy_r = ox_r = None
        g = raw[0].shape[3] // kk
    else:
        oy_r, ox_r = (
            (offset[0], offset[1]) if isinstance(offset, (tuple, list))
            else (offset[..., 0], offset[..., 1])
        )
        g = oy_r.shape[3] if oy_r.ndim == 5 else oy_r.shape[3] // kk
    if isinstance(anchor_flow, (tuple, list)):
        # (af_y, af_x) of (B,H,W,A) planes — skips the (B,H,W,A,2) stack
        # + two strided component slices of the array form (with raw=,
        # these ARE the flow planes: XLA CSEs the shared reads)
        af_y, af_x = anchor_flow
    else:
        af_y, af_x = anchor_flow[..., 0], anchor_flow[..., 1]
    a = af_y.shape[3]
    ca = cin // a
    ga = g // a
    cg = cin // g
    gk = g * kk
    ty, tx = tile
    pty, ptx = patch
    assert ca in (64, 128), "anchor-half channels must pack 128 lanes"
    xpack = 128 // ca
    align = 8 * xpack         # HBM sublane tiling in packed columns
    assert ptx % (16 * xpack) == 0
    assert ptx - align + 1 >= 0
    assert h % ty == 0 and w % tx == 0
    nty, ntx_t = h // ty, w // tx
    n_tiles = b * nty * ntx_t
    assert n_tiles % ntb == 0, "tile count must divide the DMA batch"
    n_steps = n_tiles // ntb
    tpix = ty * tx
    npixb = ntb * tpix
    r = kk * tpix * ga
    kb = tpix * ga
    sw = ca if lane_slice else 128
    uvp = pty * (ptx // xpack)
    if ntb2 is None:
        # largest divisor of ntb keeping the samp scratch ≤ ~4 MiB
        ntb2 = next(d for d in range(ntb, 0, -1)
                    if ntb % d == 0
                    and (d == 1 or d * r * sw * 2 <= 4 * 2 ** 20))
    assert ntb % ntb2 == 0, "ntb2 must divide ntb"
    if build_chunk is None:
        # largest kb-multiple divisor of R with ≤ ~3 MiB of (UVP, bc)
        # build temporaries (wy f32 + w2 bf16 + chunk dots)
        build_chunk = next(c for c in (r, 3 * kb, kb)
                           if c == kb or uvp * c * 6 <= 3 * 2 ** 20)
    assert r % build_chunk == 0, "build_chunk must divide R"

    cdt = jnp.float32
    dtp = jnp.bfloat16

    base_y = lax.broadcasted_iota(cdt, (b, h, w), 1)
    base_x = lax.broadcasted_iota(cdt, (b, h, w), 2)

    # ---- per-tile anchors ------------------------------------------------
    fy = base_y[..., None] + af_y.astype(cdt)  # (B,H,W,A)
    fx = base_x[..., None] + af_x.astype(cdt)

    def tile_min(v):  # (B,H,W,A) -> (B, nty, ntx, A)
        return jnp.min(v.reshape(b, nty, ty, ntx_t, tx, a), axis=(2, 4))

    mlo_y = (pty - ty) // 2
    # x anchors must be (8·xpack)-aligned (HBM arrays are sublane-tiled on
    # the second-minor packed dim; DMA offsets must hit tile boundaries),
    # which costs up to align−1 px of high-side budget — bias the margin low
    mlo_x = max((ptx - tx) // 2 - align // 2, 0)
    ay = jnp.floor(tile_min(fy)).astype(jnp.int32) - mlo_y
    ax = jnp.floor(tile_min(fx)).astype(jnp.int32) - mlo_x

    pad_y, pad_x = pty, ptx
    hp, wp = h + 2 * pad_y, w + 2 * pad_x
    assert pad_x % align == 0 and wp % align == 0
    if int8_dots:
        assert not ablate, "ablation modes run the bf16 dot path only"
        # symmetric per-call quantization of the value operand: zeros
        # (incl. the boundary padding below) stay exactly zero, so the
        # escape/boundary semantics are unchanged
        sx = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-20)
        xsrc = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (127.0 / sx)),
            -127, 127).astype(jnp.int8)
        dq = (sx / (127.0 * 127.0)).reshape(1, 1).astype(jnp.float32)
        dtp_patch = jnp.int8
    else:
        xsrc = x.astype(dtp)
        dq = jnp.ones((1, 1), jnp.float32)
        dtp_patch = dtp
    # pack xpack x-neighbours into the lane dim: (…, Wp/xpack, 128), lane
    # j = parity·Ca + channel — full 128-lane rows for tile-exact DMA
    xh = jnp.pad(
        xsrc.reshape(b, h, w, a, ca).transpose(0, 3, 1, 2, 4),
        ((0, 0), (0, 0), (pad_y, pad_y), (pad_x, pad_x), (0, 0)),
    ).reshape(b * a, hp, wp // xpack, xpack * ca)
    ay = jnp.clip(ay + pad_y, 0, hp - pty)   # (B, nty, ntx, A)
    ax = jnp.clip((ax + pad_x) & ~(align - 1), 0, wp - ptx) // xpack

    # flattened (b, a) leading index for the DMA source
    bidx = lax.broadcasted_iota(jnp.int32, (b, nty, ntx_t, a), 0)
    aidx = lax.broadcasted_iota(jnp.int32, (b, nty, ntx_t, a), 3)
    anchors = jnp.stack([bidx * a + aidx, ay, ax], axis=-1)
    anchors = anchors.reshape(n_steps, 1, ntb * a * 3)

    # ---- per-pixel patch-relative sample coordinates --------------------
    # offsets arranged (B,H,W,G,K,2); lane target order is (k, p, g) per
    # (tile, anchor). A direct 8-D transpose to (…, kk, ty, tx, ga) ends
    # in minor dims of 2/4/8 → XLA pads its materialized temp 16×
    # (measured: two 4.5 G HLO temps per 512² call — most of the per-call
    # HBM traffic, and the batch-2 serving OOM). Instead: one pixel-tiling
    # transpose whose minor dims stay ≥(tx, ga·kk) wide, then the final
    # (ty,tx,ga,kk)→(kk,ty,tx,ga) lane permutation as an exact one-hot
    # matmul on the MXU (Precision.HIGH = bf16_3x represents every f32
    # input exactly: 3×8 mantissa bits ≥ f32's 24, so the permute is
    # bit-exact).
    import numpy as np

    # single permute for BOTH anchors: m = (ty, tx, g=(a,ga), kk) →
    # ℓ = (a, kk, ty, tx, ga); the anchor split falls out of the output
    # reshape, so each tensor pays ONE transpose chain and ONE dot (the
    # old per-anchor variant paid two of each plus a stack copy)
    m_idx = np.arange(tpix * g * kk).reshape(ty, tx, a, ga, kk)
    m_of_l = np.transpose(m_idx, (2, 4, 0, 1, 3)).reshape(a * r)
    p_onehot = np.zeros((tpix * g * kk, a * r), np.float32)
    p_onehot[m_of_l, np.arange(a * r)] = 1.0

    def lanes(v):  # v: (B,H,W,G,K) -> (n_steps, ntb*a, R)
        # bf16 values ride a bf16 one-hot at default precision (exact
        # pass-through); f32 coordinates need Precision.HIGH (bf16_3x
        # represents every f32 input exactly: 3×8 mantissa bits ≥ 24)
        pm = jnp.asarray(p_onehot, v.dtype)
        prec = (lax.Precision.DEFAULT if v.dtype == jnp.bfloat16
                else lax.Precision.HIGH)
        va = v.reshape(b, nty, ty, ntx_t, tx, g * kk)
        va = va.transpose(0, 1, 3, 2, 4, 5).reshape(
            b * nty * ntx_t, tpix * g * kk)
        v2 = lax.dot_general(
            va, pm, (((1,), (0,)), ((), ())), precision=prec,
            preferred_element_type=v.dtype)    # (n_tiles, (a, R)) (k,p,g)
        return v2.reshape(n_steps, ntb * a, r)

    # permute the OFFSETS alone; the (pixel base + tap + padding − anchor)
    # term is a structured iota table added directly in the permuted
    # (step, tile·anchor, lane) space. Permuting `base + offset` instead
    # makes XLA lay the producer fusion out planar (H,W-minor) so the
    # (16,9)-dim broadcast is cheap, and it then pays a layout-
    # normalization copy + tiled reshape per tensor per call — measured
    # 2×(32+30) ms per 512² propagation while, the step's single largest
    # copy bucket (round-4 trace). The table is integer-valued (≤ Hp), so
    # it is EXACT in f32, and `offset + table` rounds once where the old
    # chain ((base+pad)+oy)+ky−ay rounded three times.
    sh = (n_steps, ntb * a, r)
    ia3 = lax.broadcasted_iota(jnp.int32, sh, 0)
    ja3 = lax.broadcasted_iota(jnp.int32, sh, 1)
    la3 = lax.broadcasted_iota(jnp.int32, sh, 2)
    k_i = la3 // (tpix * ga)
    p_i = (la3 % (tpix * ga)) // ga
    tile_g = (ia3 * (ntb * a) + ja3) // a          # global tile index
    nty_i = (tile_g // ntx_t) % nty
    ntx_i = tile_g % ntx_t
    # anchor per (tile, a) broadcast over its R lanes
    ay_s = ay.reshape(n_steps, ntb * a, 1)
    ax_s = (ax * xpack).reshape(n_steps, ntb * a, 1)  # real pixels
    tab_y = ((nty_i * ty + p_i // tx + pad_y - ay_s)
             + (k_i // 3 - 1) * dilation).astype(cdt)
    tab_x = ((ntx_i * tx + p_i % tx + pad_x - ax_s)
             + (k_i % 3 - 1) * dilation).astype(cdt)
    if raw is not None:
        res_y, res_x, mask_logits, flow_y, flow_x = raw
        # per-(pixel, anchor) flow → lane space via a TINY one-hot
        # (tpix·A rows vs tpix·G·K): exact f32 pass-through at HIGH
        row3 = m_of_l // (ga * kk)      # lane ℓ → source row in (ty,tx,a)
        pf = np.zeros((tpix * a, a * r), np.float32)
        pf[row3, np.arange(a * r)] = 1.0
        pf = jnp.asarray(pf)

        def lanes_flow(v):  # (B,H,W,A) f32 → (n_steps, ntb*a, r)
            va = v.astype(cdt).reshape(b, nty, ty, ntx_t, tx, a)
            va = va.transpose(0, 1, 3, 2, 4, 5).reshape(
                b * nty * ntx_t, tpix * a)
            v2 = lax.dot_general(
                va, pf, (((1,), (0,)), ((), ())),
                precision=lax.Precision.HIGH, preferred_element_type=cdt)
            return v2.reshape(n_steps, ntb * a, r)

        mrm = jnp.asarray(raw_mrm, cdt)
        ry_b = (mrm * jnp.tanh(lanes(res_y).astype(cdt))
                + lanes_flow(flow_y)) + tab_y
        rx_b = (mrm * jnp.tanh(lanes(res_x).astype(cdt))
                + lanes_flow(flow_x)) + tab_x
        mw_b = jax.nn.sigmoid(
            lanes(mask_logits).astype(cdt)).astype(jnp.bfloat16)
    else:
        ry_b = lanes(oy_r.astype(cdt)) + tab_y
        rx_b = lanes(ox_r.astype(cdt)) + tab_x
        # modulation rides bf16: it only ever multiplies into the bf16 w2
        # product, and halving its bytes halves its transpose/permute cost
        mw_b = (lanes(mask.astype(jnp.bfloat16)) if mask is not None
                else jnp.ones((n_steps, ntb * a, r), jnp.bfloat16))

    # full per-tap conv weight, anchor-split on input channels and
    # duplicated per packing parity: wall[(a,k), par·Ca + c, e]
    wall = (weight.astype(dtp).reshape(kk, a, ca, cout)
            .transpose(1, 0, 2, 3).reshape(a * kk, ca, cout))
    if xpack > 1 and not lane_slice:
        wall = jnp.concatenate([wall] * xpack, axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 1, ntb * a * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, 1, ntb * a * 3),
                lambda i, n=n_steps: (jnp.minimum(i + 1, n - 1), 0, 0),
                memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ntb * a, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntb * a, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ntb * a, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npixb, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ntb, a, pty, ptx // xpack, 128), dtp_patch),
            pltpu.VMEM((ntb2, r, sw), dtp),
            pltpu.VMEM((npixb, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((2, ntb, a)),
        ],
    )

    if ablate == "prep":
        # time the XLA-side preparation alone (no pallas dispatch): forces
        # lanes()/anchors/xh to compute via full reductions, returns a
        # correctly-shaped dummy
        tot = (ry_b.sum() + rx_b.sum() + mw_b.sum() + wall.sum()
               + xh[0, 0, 0, 0].astype(jnp.float32)
               + anchors.astype(jnp.float32).sum())
        out = jnp.broadcast_to(
            tot.astype(dtp), (n_steps, npixb, cout))
        out = (out.reshape(b, nty, ntx_t, ty, tx, cout)
                  .transpose(0, 1, 3, 2, 4, 5)
                  .reshape(b, h, w, cout)).astype(x.dtype)
        return out if bias is None else out + bias.astype(out.dtype)

    kernel = functools.partial(
        _dcn_tile_kernel,
        ntb=ntb, a=a, ga=ga, kk=kk, pty=pty, ptx=ptx, xpack=xpack,
        ca=ca, cg=cg, cout=cout, tpix=tpix, n_steps=n_steps, ablate=ablate,
        lane_slice=lane_slice, bc=build_chunk, ntb2=ntb2,
        int8_dots=int8_dots,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, npixb, cout), dtp),
        grid_spec=grid_spec,
        interpret=interpret,
    )(anchors, anchors, dq, ry_b, rx_b, mw_b, xh, wall)

    out = (out.reshape(b, nty, ntx_t, ty, tx, cout)
              .transpose(0, 1, 3, 2, 4, 5)
              .reshape(b, h, w, cout)).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def tile_escape_fraction(
    anchor_flow: Array,
    offset: Array,
    *,
    tile: tuple[int, int] = (2, 2),
    patch: tuple[int, int] = (14, 32),
    xpack: int = 2,
) -> Array:
    """Fraction of (pixel, group, tap) bilinear supports escaping their
    tile patch (and therefore zeroed). Diagnostic for the conditional
    exactness contract (VERDICT round-1 item 6).

    ``xpack`` = 128 // (cin // A), the kernel's x-pixel lane packing: it
    sets the anchor alignment (8·xpack real pixels) and low-side margin,
    so pass 1 for cin=256 sites and 2 (default) for cin=128 sites. The
    anchor math below mirrors deform_conv2d_tile exactly, including the
    border clipping of anchors into the padded operand."""
    b, h, w, g, kk, _ = offset.shape
    a = anchor_flow.shape[3]
    ty, tx = tile
    pty, ptx = patch
    align = 8 * xpack
    pad_y, pad_x = pty, ptx
    hp, wp = h + 2 * pad_y, w + 2 * pad_x
    nty, ntx_t = h // ty, w // tx
    cdt = jnp.float32
    base_y = lax.broadcasted_iota(cdt, (b, h, w), 1)
    base_x = lax.broadcasted_iota(cdt, (b, h, w), 2)
    fy = base_y[..., None] + anchor_flow[..., 0].astype(cdt)
    fx = base_x[..., None] + anchor_flow[..., 1].astype(cdt)

    def tile_min(v):
        return jnp.min(v.reshape(b, nty, ty, ntx_t, tx, a), axis=(2, 4))

    ay = jnp.floor(tile_min(fy)) - (pty - ty) // 2
    ax = jnp.floor(tile_min(fx)) - max((ptx - tx) // 2 - align // 2, 0)
    # aligned + border-clipped anchors, as the kernel computes them
    # (deform_conv2d_tile: (ax+pad_x) & ~(align-1), clip to [0, wp-ptx]);
    # expressed back in unpadded coordinates for the residue test below
    ay = jnp.clip(ay + pad_y, 0, hp - pty) - pad_y
    ax = jnp.floor((ax + pad_x) / align) * align
    ax = jnp.clip(ax, 0, wp - ptx) - pad_x
    ay_px = jnp.repeat(jnp.repeat(ay, ty, axis=1), tx, axis=2)
    ax_px = jnp.repeat(jnp.repeat(ax, ty, axis=1), tx, axis=2)
    ga = g // a
    ky = (jnp.repeat(jnp.arange(3), 3).astype(cdt) - 1.0)
    kx = (jnp.tile(jnp.arange(3), 3).astype(cdt) - 1.0)
    sy = base_y[..., None, None] + offset[..., 0].astype(cdt) + ky
    sx = base_x[..., None, None] + offset[..., 1].astype(cdt) + kx
    ry = sy - jnp.repeat(ay_px, ga, axis=-1)[..., None]
    rx = sx - jnp.repeat(ax_px, ga, axis=-1)[..., None]
    # bilinear support [floor(r), floor(r)+1] must lie in [0, P-1]
    esc = ((jnp.floor(ry) < 0) | (jnp.floor(ry) + 1 > pty - 1)
           | (jnp.floor(rx) < 0) | (jnp.floor(rx) + 1 > ptx - 1))
    return jnp.mean(esc.astype(jnp.float32))


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def deform_conv2d_tile_ad(
    x, anchor_flow, offset, weight, bias, mask_is_none,
    tile, patch, ntb, lane_slice=False, mask=None,
):
    """Differentiable wrapper: Pallas tile kernel forward, XLA patch-path
    gradients (the backward re-runs ``deform_conv2d_patch``'s VJP, whose
    semantics match within the escape contract)."""
    del mask_is_none
    return deform_conv2d_tile(
        x, anchor_flow, offset, weight, bias, mask=mask,
        tile=tile, patch=patch, ntb=ntb, lane_slice=lane_slice)


def _tile_ad_fwd(x, anchor_flow, offset, weight, bias, mask_is_none,
                 tile, patch, ntb, lane_slice=False, mask=None):
    out = deform_conv2d_tile_ad(
        x, anchor_flow, offset, weight, bias, mask_is_none,
        tile, patch, ntb, lane_slice, mask=mask)
    return out, (x, anchor_flow, offset, weight, bias, mask)


def _tile_ad_bwd(mask_is_none, tile, patch, ntb, lane_slice, res, g):
    from .deform import deform_conv2d_patch

    x, anchor_flow, offset, weight, bias, mask = res
    ps = min(patch[0], 16)

    def _5d(v):
        # split components may be channel-flat (B,H,W,G·K); gradients flow
        # back through the reshape/stack to the flat components automatically
        if v.ndim == 4:
            bb, hh, ww, gk = v.shape
            v = v.reshape(bb, hh, ww, gk // 9, 9)
        return v

    def _stack(off):
        # the patch path takes stacked (…, 2) offsets
        return (jnp.stack([_5d(off[0]), _5d(off[1])], axis=-1)
                if isinstance(off, (tuple, list)) else off)

    if mask_is_none:
        def f(x, anchor_flow, offset, weight, bias):
            return deform_conv2d_patch(
                x, anchor_flow, _stack(offset), weight, bias, patch_size=ps)

        _, vjp = jax.vjp(f, x, anchor_flow, offset, weight, bias)
        return vjp(g) + (None,)

    def f(x, anchor_flow, offset, weight, bias, mask):
        return deform_conv2d_patch(
            x, anchor_flow, _stack(offset), weight, bias, mask=_5d(mask),
            patch_size=ps)

    _, vjp = jax.vjp(f, x, anchor_flow, offset, weight, bias, mask)
    return vjp(g)


deform_conv2d_tile_ad.defvjp(_tile_ad_fwd, _tile_ad_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def deform_conv2d_tile_raw_ad(
    x, res_y, res_x, mask_logits, flow_y, flow_x,
    weight, bias, mrm, tile, patch, ntb, lane_slice=False,
    int8_dots=False,
):
    """Differentiable raw-prep tile DCN: forward runs the Pallas kernel
    with the lane-space offset prep (``raw=``, single-pass bf16 permute);
    backward reconstructs materialized offsets and re-runs the XLA patch
    path's VJP (gradients flow to the raw logits through tanh/sigmoid).
    The patch anchors ARE the (flow_y, flow_x) planes — no separate
    anchor argument (the stacked (B,H,W,A,2) form cost a lane-minor
    stack + two strided re-slices per call)."""
    return deform_conv2d_tile(
        x, (flow_y, flow_x), None, weight, bias,
        raw=(res_y, res_x, mask_logits, flow_y, flow_x), raw_mrm=mrm,
        tile=tile, patch=patch, ntb=ntb, lane_slice=lane_slice,
        int8_dots=int8_dots)


def _materialize_raw(res_y, res_x, mask_logits, flow_y, flow_x, mrm):
    """(res, flows, mrm) → stacked (B,H,W,G,9,2) offsets + (B,H,W,G,9)
    mask, matching the raw path's per-element op order exactly."""
    bb, hh, ww, gk = res_y.shape
    g = gk // 9
    rep = gk // flow_y.shape[-1]

    def comp(res, flow):
        o = mrm * jnp.tanh(res.astype(jnp.float32))
        o = o + jnp.repeat(flow.astype(jnp.float32), rep, axis=-1)
        return o.reshape(bb, hh, ww, g, 9)

    off = jnp.stack([comp(res_y, flow_y), comp(res_x, flow_x)], axis=-1)
    mask = jax.nn.sigmoid(
        mask_logits.astype(jnp.float32)).reshape(bb, hh, ww, g, 9)
    return off, mask


def _tile_raw_ad_fwd(x, res_y, res_x, mask_logits,
                     flow_y, flow_x, weight, bias,
                     mrm, tile, patch, ntb, lane_slice=False,
                     int8_dots=False):
    out = deform_conv2d_tile_raw_ad(
        x, res_y, res_x, mask_logits, flow_y, flow_x,
        weight, bias, mrm, tile, patch, ntb, lane_slice, int8_dots)
    return out, (x, res_y, res_x, mask_logits,
                 flow_y, flow_x, weight, bias)


def _tile_raw_ad_bwd(mrm, tile, patch, ntb, lane_slice, int8_dots, res, g):
    from .deform import deform_conv2d_patch

    (x, res_y, res_x, mask_logits,
     flow_y, flow_x, weight, bias) = res
    ps = min(patch[0], 16)

    def f(x, res_y, res_x, mask_logits, flow_y, flow_x,
          weight, bias):
        off, mask = _materialize_raw(
            res_y, res_x, mask_logits, flow_y, flow_x, mrm)
        anchor = jnp.stack([flow_y, flow_x], axis=-1)  # (B,H,W,A,(dy,dx))
        return deform_conv2d_patch(
            x, anchor, off, weight, bias, mask=mask, patch_size=ps)

    _, vjp = jax.vjp(f, x, res_y, res_x, mask_logits,
                     flow_y, flow_x, weight, bias)
    return vjp(g)


deform_conv2d_tile_raw_ad.defvjp(_tile_raw_ad_fwd, _tile_raw_ad_bwd)
