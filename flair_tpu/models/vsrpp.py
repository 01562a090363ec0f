"""BasicVSR++ propagation as lax.scan + gather-based DCNv2 (TPU-native).

Re-design of the reference temporal propagation stack
(unet.py:313-661 / unet_new.py:608-898, both built on mmcv/mmedit CUDA ops):

- ``ResidualBlocksWithInputConv`` — conv + LReLU + N ResidualBlockNoBN
  (mmedit building block, imported at unet.py:34-38).
- ``SecondOrderDeformableAlignment`` — flow-guided modulated deformable conv
  whose offsets are tanh-capped residues around the optical flow
  (unet.py:598-661); deformable conv itself is ops.deform (XLA gathers +
  MXU matmuls) instead of torchvision/mmcv CUDA kernels.
- ``BasicVSRPP`` — backward_1 + forward_1 recurrent branches
  (unet.py:313-595). The reference's Python frame loop is a plain
  ``lax.scan`` over a PURE step function (``_run_branch``): branch params
  are registered by name-matched shell modules (identical tree to the
  r1-r4 ``nn.scan`` formulation, so converted reference weights and the
  archived goldens load unchanged) and enter the scan as closure
  constants. That split is what lets the **frame-batchable halves of the
  in-scan convs hoist out of the recurrence** (round-5 lever, VERDICT r4
  #2): ``conv(cat(a, b)) = conv_a(a) + conv_b(b)`` exactly, and in both
  ``offset_conv0`` (consumes cat(cond_n1, feat_current, cond_n2, flows),
  unet.py:620-645) and the backbone input conv (cat(feat_current, extra,
  prop), unet.py:659-668) only the warped-carry blocks actually depend on
  the recurrence — ``feat_current``/``extra``/flows are scan xs, computed
  for all T frames in ONE batched conv per window instead of T sequential
  per-frame convs on the scan's critical path. Numerics: the split sums
  each half's f32 conv accumulator before the output-dtype round, so
  outputs differ from the single-conv form only by float reassociation
  (≤1 output-dtype ulp; asserted ≤2e-6 rms in f32, tests/test_models.py).

Convention: hidden features (B, T, H, W, C); flows (B, T-1, H, W, 2) with
flow[..., 0] = dx.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.deform import deform_conv2d_patch, modulated_deform_conv2d
from ..ops.dcn_pallas import (
    _materialize_raw, deform_conv2d_tile_raw_ad)
from ..ops.warp import flow_warp
from .common import leaky_relu
from .registry import register_model

# one-shot process-level notice that 'auto' picked the tile DCN kernel
_TILE_NOTICE: list = []


def _tile_config(pty: int, ca: int = 64):
    """Tile-DCN kernel configuration: (tile, patch, ntb, lane_slice,
    int8_dots).

    Default is the round-3 measured winner ((2,4)/(pty,32); sweep v2 in
    PERF.md — larger tiles lose to window-MAC inflation once the layout
    fix removed the fixed-cost tax; the round-5 rawsweep re-probed
    lane_slice under the raw-offset path and it still loses ~2 ms/call
    at both M classes, and killed (2,8) tiles on escape rate). Override
    with FLAIR_DCN_TILE="ty,tx,pty_pad,ptx,ntb[,lane]" to flip on a
    tools/profile_ops.py `tile`/`rawsweep` winner without code edits —
    ``pty_pad`` is ADDED to the M-derived patch height (so one env value
    serves both the SR3 M=5/pty=16 and ADM M=10/pty=20 routings;
    pty=20 at M=10 is the round-5 measured winner: -17% window-dot
    MACs, escape 1.3e-3 at sigma=0.3 under the 2e-2 M10 budget).
    ``ca`` is the per-anchor channel width (cin // 2).

    ``int8_dots`` (FLAIR_DCN_INT8=0 to disable): run the window dots at
    the MXU's int8 rate — see ops/dcn_pallas.deform_conv2d_tile and the
    PERF.md round-5 measurements for the rate/accuracy trade."""
    import os

    # default OFF until the round-5 rate/accuracy measurements land;
    # flipped by the measured decision in PERF.md round 5
    int8 = os.environ.get("FLAIR_DCN_INT8", "0") == "1"
    env = os.environ.get("FLAIR_DCN_TILE")
    if not env:
        # ntb: measured per shape class (bigntb probe, PERF.md round 3) —
        # cin=256 sites (ca=128, xpack=1) run faster AND halve the patch
        # scratch at ntb=8 (13.4 vs 18.3 ms at 256²); cin=128 sites keep
        # ntb=16 (67.5 vs 74.3 at ntb8). The tall ADM patch (pty>16) also
        # rides ntb=8: ntb=16 needs 17.64 M scoped VMEM (16 M limit).
        ntb = 8 if (ca == 128 or pty > 16) else 16
        return (2, 4), (pty, 32), ntb, False, int8
    try:
        parts = [p.strip() for p in env.split(",")]
        ty, tx, pty_pad, ptx, ntb = (int(p) for p in parts[:5])
        lane = len(parts) > 5 and parts[5] == "lane"
    except (ValueError, IndexError):
        # the advertised no-code-edit knob must not kill a serving run
        # mid-trace on a typo — warn and keep the default config
        import logging

        logging.getLogger("flair_tpu").warning(
            "FLAIR_DCN_TILE=%r is malformed (want "
            "'ty,tx,pty_pad,ptx,ntb[,lane]'); using the default tile "
            "config", env)
        return (2, 4), (pty, 32), 16, False, int8
    return (ty, tx), (pty + pty_pad, ptx), ntb, lane, int8

Array = jax.Array


def compose_second_order_flows(
    flows_forward: Array, flows_backward: Array
) -> tuple[Array, Array]:
    """Window-constant second-order flows for both propagation branches,
    composed OUTSIDE the per-frame scan (unet.py:466-476:
    ``flow_n2 = flow_n1 + flow_warp(flow_n2, flow_n1)``).

    The composition depends only on the optical flows — constant across a
    window's sampler steps and identical for every VSR++ site at the same
    resolution — yet the round-3 build recomputed it as T sequential
    2-channel warps inside EVERY branch scan of EVERY site of EVERY step
    (120 small-row gathers per guided step at 512²). Here it is one
    batched warp per branch; precompute it once per window via the model
    ``flows`` dict (sr3.py/adm.py store ``(fwd, bwd, fwd2, bwd2)``) and
    the scans do zero flow-composition work.

    ``flows_*``: (B, T-1, H, W, 2). Returns (fwd2, bwd2), each
    (B, T, H, W, 2) frame-indexed: ``bwd2[:, j]`` is the backward
    branch's composed flow at frame j, ``fwd2[:, j]`` the forward
    branch's; zero where the branch has fewer than two predecessors
    (the reference's ``use_n2`` gate). Bit-identical to the in-scan
    composition (per-batch-element-independent gather; multiplication
    by the gate commutes)."""
    b, tm1, h, w, _ = flows_forward.shape
    t = tm1 + 1
    dt = flows_forward.dtype
    z1 = jnp.zeros((b, 1, h, w, 2), dt)
    z2 = jnp.zeros((b, 2, h, w, 2), dt)
    j = jnp.arange(t)

    def comp(n1, n2, gate):
        warped = flow_warp(
            n2.reshape(b * t, h, w, 2), n1.reshape(b * t, h, w, 2)
        ).reshape(b, t, h, w, 2)
        return gate.reshape(1, t, 1, 1, 1).astype(dt) * (n1 + warped)

    bwd, fwd = flows_backward, flows_forward
    bwd2 = comp(
        jnp.concatenate([bwd, z1], axis=1),
        jnp.concatenate([bwd[:, 1:], z2], axis=1),
        j < t - 2,
    )
    fwd2 = comp(
        jnp.concatenate([z1, fwd], axis=1),
        jnp.concatenate([z2, fwd[:, :-1]], axis=1),
        j > 1,
    )
    return fwd2, bwd2


def resize_weight_map(weight: Array, h: int, w: int) -> Array:
    """Nearest-resize a (B, T, H0, W0, 1) VSR++ gating map to (h, w).

    Window-constant like the flows: the UNets pre-resize once per rnn
    resolution per forward (next to the flows dict) instead of paying
    the two einsums inside every VSR++ site at every step. BasicVSRPP
    still resizes lazily for direct callers (same function —
    bit-identical either way)."""
    from ..ops.resize import resize_matrix

    ry = jnp.asarray(resize_matrix(h, weight.shape[2], "nearest"),
                     weight.dtype)
    rx = jnp.asarray(resize_matrix(w, weight.shape[3], "nearest"),
                     weight.dtype)
    weight = jnp.einsum("uh,bthwc->btuwc", ry, weight)
    weight = jnp.einsum("vw,bthwc->bthvc", rx, weight)
    return weight


class ResidualBlockNoBN(nn.Module):
    """mmedit ResidualBlockNoBN: x + conv(relu(conv(x)))."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(
            self.features, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv1",
        )(x)
        h = jax.nn.relu(h)
        h = nn.Conv(
            self.features, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv2",
        )(h)
        return x + h


class ResidualBlocksWithInputConv(nn.Module):
    """Input conv + LeakyReLU(0.1) + num_blocks residual blocks (mmedit)."""

    features: int
    num_blocks: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(
            self.features, (3, 3), padding="SAME",
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_in",
        )(x)
        x = leaky_relu(x, 0.1)
        for i in range(self.num_blocks):
            x = ResidualBlockNoBN(self.features, self.dtype, name=f"block{i}")(x)
        return x


def _offset_perm(g: int) -> tuple:
    """Static output-channel permutation making offset_out's y/x offset
    planes contiguous. The reference layout natively interleaves
    (group, tap, y|x) per anchor half (unet.py:636-645); permuting the
    conv KERNEL columns instead of the activation makes the downstream
    raw_y/raw_x/mask blocks free contiguous slices."""
    nch = 27 * g  # = (g/2 groups)·9 taps·2 comps per half + 9g mask
    ko = 9 * (g // 2)
    base_c = np.arange(ko) * 2          # y channels within one half
    return tuple(np.concatenate([
        base_c, 2 * ko + base_c,              # y: half1, half2
        base_c + 1, 2 * ko + base_c + 1,      # x: half1, half2
        np.arange(4 * ko, nch),               # mask block unchanged
    ]).tolist())


class _PermutedOutConv(nn.Module):
    """3×3 SAME conv whose OUTPUT channels are permuted at weight-apply
    time. Param tree identical to ``nn.Conv`` (kernel/bias, zero-init), so
    converted reference weights load unchanged; permuting the kernel
    columns instead of the activation makes the downstream y/x offset
    planes contiguous (a stride-2 slice of a 512²×432ch f32 activation is
    a ~150 MB relayout per plane; permuting the (3,3,Cin,432) kernel is
    free). Output[..., e] ≡ nn.Conv output[..., perm[e]] exactly."""

    features: int
    perm: tuple  # static output-channel permutation
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k = self.param(
            "kernel", nn.initializers.zeros,
            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32)
        perm = jnp.asarray(self.perm, jnp.int32)
        k = jnp.take(k, perm, axis=3).astype(self.dtype)
        bias = jnp.take(bias, perm, axis=0).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


def _auto_patch_size(dcn_patch_size, mrm: float) -> Optional[int]:
    if dcn_patch_size == "auto":
        return min(2 * math.ceil(mrm) + 4, 16)
    return dcn_patch_size


def apply_deform_align(
    x: Array,
    raw_y: Array,
    raw_x: Array,
    mask_logits: Array,
    flow_1,
    flow_2,
    weight: Array,
    bias: Array,
    *,
    max_residue_magnitude: float,
    dcn_patch_size: Any = "auto",
    dcn_impl: str = "auto",
    dtype: Any = jnp.float32,
) -> Array:
    """Pure deformable-conv dispatch shared by the module and the scanned
    branch: PRE-ACTIVATION offset/mask channel blocks + per-anchor flow
    planes in, aligned features out (unet.py:646-661 semantics).

    ``x``: (B, H, W, 2C) = cat(prop_n1, prop_n2); ``raw_y``/``raw_x``:
    (B, H, W, G·K) pre-tanh residue blocks in (half, group, tap) channel
    order; ``mask_logits``: (B, H, W, G·K) pre-sigmoid; ``flow_1``/
    ``flow_2``: (fx, fy) tuples of (B, H, W) component planes. The raw
    blocks stay channel-flat all the way into the tile kernel's lane
    permute (materialized (…,g,9) offsets cost a K=9-minor padded-layout
    copy per call, round-4 trace); fallback paths materialize offsets via
    ``_materialize_raw`` (same per-element op order)."""
    g = raw_y.shape[3] // 9
    f1x, f1y = flow_1
    f2x, f2y = flow_2
    use_tile = dcn_impl == "tile" or (
        dcn_impl == "auto" and jax.default_backend() == "tpu"
    )
    # the gate must imply EVERY deform_conv2d_tile precondition, so odd
    # resolutions fall back to the patch path instead of tracing into a
    # kernel AssertionError. For config (ty,tx)/(pty,ptx)/ntb:
    #   h%ty==0, w%tx==0, ca=cin/2 ∈ {64,128},
    #   ptx % (16·xpack) == 0 and (w + 2·ptx) % (8·xpack) == 0 (HBM
    #   sublane tiling of the padded packed operand; xpack = 128/ca),
    #   n_tiles = b·(h/ty)·(w/tx) divisible by ntb.
    _pty0 = 16 if max_residue_magnitude <= 5 else 20
    (_ty, _tx), (_, _ptx), _ntb, _, _ = _tile_config(
        _pty0, x.shape[-1] // 2)
    if use_tile and x.shape[1] % _ty == 0 and x.shape[2] % _tx == 0 \
            and x.shape[-1] // 2 in (64, 128):
        _ca = x.shape[-1] // 2
        _xpack = 128 // _ca
        _align = 8 * _xpack
        _n_tiles = (x.shape[0] * (x.shape[1] // _ty)
                    * (x.shape[2] // _tx))
        use_tile = (
            _ptx % (16 * _xpack) == 0
            and (x.shape[2] + 2 * _ptx) % _align == 0
            and _n_tiles % _ntb == 0
        )
    else:
        use_tile = False
    if use_tile and dcn_impl == "auto" and not _TILE_NOTICE:
        # surface the silent accuracy trade (ADVICE r2): the tile kernel
        # zeroes bilinear supports that escape their patch (measured
        # ≤2e-3 under realistic offsets, PERF.md); parity-critical runs
        # should force dcn_impl='patch' / --exact-dcn
        _TILE_NOTICE.append(True)
        import logging

        logging.getLogger("flair_tpu").info(
            "dcn_impl='auto' on TPU selects the tile-anchored Pallas DCN "
            "kernel (conditionally exact: out-of-patch bilinear supports "
            "contribute zero; use dcn_impl='patch' for exact parity)"
        )
    # per-anchor flow planes, (B,H,W,A) in (half1, half2) order — the
    # ONLY flow materializations on the tile path (they double as the
    # kernel's patch anchors)
    flow_y = jnp.stack([f1y, f2y], axis=-1).astype(jnp.float32)
    flow_x = jnp.stack([f1x, f2x], axis=-1).astype(jnp.float32)
    # value path runs in the module dtype (the reference runs the trunk —
    # including deform_conv2d — in fp16, sr3.py:528-541); offsets/mask
    # stay f32 and the coords are kept f32 inside the kernel
    if use_tile:
        pty = 16 if max_residue_magnitude <= 5 else 20
        tile_t, patch_p, ntb_n, lane, int8 = _tile_config(
            pty, x.shape[-1] // 2)
        y = deform_conv2d_tile_raw_ad(
            x.astype(dtype), raw_y, raw_x, mask_logits,
            flow_y, flow_x,
            weight, bias, float(max_residue_magnitude),
            tile_t, patch_p, ntb_n, lane, int8,
        )
        return y.astype(x.dtype)
    # fallback paths take stacked (B,H,W,g,9,2) offsets + 5-D mask
    off, mask = _materialize_raw(
        raw_y, raw_x, mask_logits, flow_y, flow_x,
        max_residue_magnitude)
    ps = _auto_patch_size(dcn_patch_size, max_residue_magnitude)
    if ps is not None:
        # fast path: one (ps,ps,C/2) patch per (pixel, flow half) anchored
        # at floor(flow) covers all taps' bilinear corners (PERF.md)
        anchor = jnp.stack(
            [flow_y, flow_x], axis=-1
        )  # (B,H,W,A,2) in (dy,dx)
        y = deform_conv2d_patch(
            x.astype(dtype), anchor, off, weight, bias,
            mask=mask, patch_size=ps,
        )
    else:
        y = modulated_deform_conv2d(
            x.astype(dtype), off, mask, weight, bias, padding=1
        )
    return y.astype(x.dtype)


class SecondOrderDeformableAlignment(nn.Module):
    """Flow-guided second-order deformable alignment (unet.py:598-661).

    ``__call__(x, extra_feat, flow_1, flow_2)`` where x = cat(prop_n1,
    prop_n2) (2C channels), extra_feat = cat(cond_n1, feat_current, cond_n2)
    (3C). Offsets = max_residue_magnitude·tanh(conv_stack) + flow (flipped to
    (dy, dx)); mask = sigmoid. deform_groups split half/half over the two
    propagated feature sets.

    ``flow_1``/``flow_2`` are (B, H, W, 2) arrays (flow[..., 0] = dx) or
    tuples ``(fdx, fdy)`` of (B, H, W) component planes — the plane form
    (what the scanned production path passes) avoids every lane-minor
    (…, 2) materialization and strided component re-slice between the
    scan xs and the kernel (each ~8 ms/step of async DMA at 512²).

    The scanned production path (``_run_branch``) does not call this
    module — it applies the same math through ``apply_deform_align`` with
    the frame-batchable half of ``offset_conv0`` hoisted out of the scan;
    this module remains the reference formulation for direct callers and
    parity tests (single conv over the full cat, no split).
    """

    features: int  # C (output channels)
    deform_groups: int = 16
    max_residue_magnitude: float = 10.0
    # flow-anchored patch sampling (ops/deform.deform_conv2d_patch):
    #   None   -> exact per-sample gather path (slow on TPU; parity mode)
    #   "auto" -> patch 2*ceil(M)+4 capped at 16: unconditionally exact when
    #             M <= 6 (the SR3 UNet uses M=5), else exact for |residue|<=6
    #   int    -> explicit patch size
    dcn_patch_size: Any = "auto"
    # kernel implementation:
    #   "auto"  -> Pallas tile-anchored kernel (ops/dcn_pallas) on TPU,
    #              XLA patch gathers elsewhere
    #   "tile"  -> force the Pallas kernel
    #   "patch" -> force the XLA patch-gather path
    dcn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: Array, extra_feat: Array, flow_1: Array, flow_2: Array
    ) -> Array:
        g = self.deform_groups
        c = self.features
        if isinstance(flow_1, (tuple, list)):
            f1x, f1y = flow_1
            f2x, f2y = flow_2
            flow_feats = [f1x[..., None], f1y[..., None],
                          f2x[..., None], f2y[..., None]]
        else:
            f1x, f1y = flow_1[..., 0], flow_1[..., 1]
            f2x, f2y = flow_2[..., 0], flow_2[..., 1]
            flow_feats = [flow_1, flow_2]
        feat = jnp.concatenate([extra_feat, *flow_feats], axis=-1)
        h = feat
        for i in range(3):
            h = nn.Conv(
                c, (3, 3), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32, name=f"offset_conv{i}",
            )(h)
            h = leaky_relu(h, 0.1)
        out = _PermutedOutConv(
            27 * g, _offset_perm(g), dtype=self.dtype, name="offset_out")(h)
        ko = 9 * (g // 2)
        # PRE-ACTIVATION channel blocks, channel order (half, group, tap).
        raw_y = out[..., :2 * ko]
        raw_x = out[..., 2 * ko:4 * ko]
        mask_logits = out[..., 4 * ko:]

        weight = self.param(
            "weight",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], c),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return apply_deform_align(
            x, raw_y, raw_x, mask_logits, (f1x, f1y), (f2x, f2y),
            weight, bias,
            max_residue_magnitude=self.max_residue_magnitude,
            dcn_patch_size=self.dcn_patch_size, dcn_impl=self.dcn_impl,
            dtype=self.dtype)


class _ConvP(nn.Module):
    """Registers nn.Conv-compatible params (f32 kernel + zero bias, same
    names/shapes/inits) and returns them RAW instead of applying — the
    scanned branch applies them functionally so kernel slices can hoist
    out of the recurrence while converted checkpoints load unchanged."""

    shape: tuple  # (kh, kw, cin, cout)
    zero_kernel: bool = False

    @nn.compact
    def __call__(self):
        kinit = (nn.initializers.zeros if self.zero_kernel
                 else nn.initializers.lecun_normal())
        k = self.param("kernel", kinit, self.shape, jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.shape[-1],), jnp.float32)
        return k, b


class _AlignParams(nn.Module):
    """SecondOrderDeformableAlignment's param tree (paths/shapes/inits
    identical to the module form; converter map utils/convert.py:339-356)."""

    features: int
    deform_groups: int

    @nn.compact
    def __call__(self):
        c, g = self.features, self.deform_groups
        return {
            "offset_conv0": _ConvP((3, 3, 3 * c + 4, c),
                                   name="offset_conv0")(),
            "offset_conv1": _ConvP((3, 3, c, c), name="offset_conv1")(),
            "offset_conv2": _ConvP((3, 3, c, c), name="offset_conv2")(),
            "offset_out": _ConvP((3, 3, c, 27 * g), zero_kernel=True,
                                 name="offset_out")(),
            "weight": self.param(
                "weight", nn.initializers.lecun_normal(),
                (3, 3, 2 * c, c), jnp.float32),
            "bias": self.param(
                "bias", nn.initializers.zeros, (c,), jnp.float32),
        }


class _Block0Params(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        c = self.features
        return {"conv1": _ConvP((3, 3, c, c), name="conv1")(),
                "conv2": _ConvP((3, 3, c, c), name="conv2")()}


class _BackboneParams(nn.Module):
    """ResidualBlocksWithInputConv(num_blocks=1) param tree."""

    features: int
    in_ch: int

    @nn.compact
    def __call__(self):
        return {
            "conv_in": _ConvP((3, 3, self.in_ch, self.features),
                              name="conv_in")(),
            "block0": _Block0Params(self.features, name="block0")(),
        }


class _BranchParams(nn.Module):
    """One propagation branch's params (deform_align + backbone), with the
    exact scope paths the r1-r4 nn.scan tree produced under
    backward_1/forward_1."""

    features: int
    conv_in_ch: int  # backbone conv_in input channels (2C bwd, 3C fwd)
    deform_groups: int

    @nn.compact
    def __call__(self):
        return {
            "align": _AlignParams(self.features, self.deform_groups,
                                  name="deform_align")(),
            "backbone": _BackboneParams(self.features, self.conv_in_ch,
                                        name="backbone")(),
        }


def _run_branch(
    p: dict,
    feats_t: Array,
    extra_t: Optional[Array],
    f1_t: Array,
    f2_t: Array,
    w_t: Array,
    idxs: Array,
    *,
    deform_groups: int,
    max_residue_magnitude: float,
    dcn_patch_size: Any,
    dcn_impl: str,
    dtype: Any,
) -> Array:
    """One propagation branch (unet.py:440-492) as a pure ``lax.scan``.

    All inputs time-major (already reversed for the backward branch):
    ``feats_t`` (T, B, H, W, C) current features; ``extra_t`` (T, B, H, W,
    C) backward-branch output for the forward branch, None for the
    backward branch; ``f1_t``/``f2_t`` (T, B, 2, H, W) component-packed
    first/second-order flows (packed: a trailing size-2 lane dim on scan
    xs costs 64×-padded remat copies, round-3 trace); ``w_t`` (T, B, k,
    H, W) packed gating. Returns the stacked per-frame outputs
    (T, B, H, W, C).

    The hoist (round-5): the offset stack's first conv consumes
    cat(cond_n1, feat_current, cond_n2, f1x, f1y, f2x, f2y)
    (unet.py:620-645) and the backbone input conv consumes
    cat(feat_current, extra, prop) (unet.py:659-668). By conv linearity
    over input-channel blocks, the ``feat_current``/flows/``extra``
    contributions — scan xs, not carry — are computed here for ALL T
    frames in one batched conv per branch; only the warped-carry halves
    (cat(cond_n1, cond_n2) resp. prop) stay inside the scan."""
    t_, b, h, w, c = feats_t.shape
    g = deform_groups
    dt = dtype

    def conv(v, k):
        return lax.conv_general_dilated(
            v.astype(dt), k.astype(dt), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    k0, b0 = p["align"]["offset_conv0"]
    k1, b1 = p["align"]["offset_conv1"]
    k2, b2 = p["align"]["offset_conv2"]
    ko, bo = p["align"]["offset_out"]
    wal, bal = p["align"]["weight"], p["align"]["bias"]
    kin, bin_ = p["backbone"]["conv_in"]
    kb1, bb1 = p["backbone"]["block0"]["conv1"]
    kb2, bb2 = p["backbone"]["block0"]["conv2"]

    # offset_out with the output-channel permutation folded into the
    # kernel (see _PermutedOutConv — identical math)
    perm = jnp.asarray(_offset_perm(g), jnp.int32)
    ko_p = jnp.take(ko, perm, axis=3)
    bo_p = jnp.take(bo, perm, axis=0)

    e = 0 if extra_t is None else extra_t.shape[-1]

    # ---- hoisted frame-batched halves (outside the recurrence) ----------
    # offset_conv0 channel blocks: [0:C)=cond_n1, [C:2C)=feat_current,
    # [2C:3C)=cond_n2, [3C:3C+4)=flows
    fl = jnp.concatenate(
        [jnp.moveaxis(f1_t, 2, -1), jnp.moveaxis(f2_t, 2, -1)], axis=-1
    ).astype(dt)  # (T,B,H,W,4), channels (f1x, f1y, f2x, f2y)
    k0_xs = jnp.concatenate([k0[:, :, c:2 * c], k0[:, :, 3 * c:]], axis=2)
    h0_xs = conv(
        jnp.concatenate([feats_t.astype(dt), fl], axis=-1)
        .reshape(t_ * b, h, w, c + 4),
        k0_xs) + b0.astype(dt)
    # backbone conv_in blocks: [0:C)=feat_current, [C:C+e)=extra,
    # [C+e:2C+e)=prop
    bb_in = (feats_t if e == 0
             else jnp.concatenate([feats_t, extra_t], axis=-1))
    bb_xs = conv(bb_in.reshape(t_ * b, h, w, c + e),
                 kin[:, :, :c + e]) + bin_.astype(dt)
    # one packed (…, 2C) xs: full 128 lanes at the 512²/C=64 sites (two
    # separate C=64 bf16 xs would each pad 2× in the scan's stacked form)
    hoist_t = jnp.concatenate([h0_xs, bb_xs], axis=-1).reshape(
        t_, b, h, w, 2 * c)

    k0_ser = jnp.concatenate([k0[:, :, :c], k0[:, :, 2 * c:3 * c]], axis=2)
    kin_ser = kin[:, :, c + e:]

    def body(carry, xs):
        prop_n1, prop_n2 = carry
        hoist, f1, f2, wt, idx = xs
        f1x, f1y = f1[:, 0], f1[:, 1]
        f2x, f2y = f2[:, 0], f2[:, 1]
        wt = jnp.moveaxis(wt, 1, -1)

        # the reference computes the full alignment for the FIRST scanned
        # frame too and multiplies it by zero (unet.py:471-489 `if idx > 0`
        # guard); lax.cond skips the warps + offset convs + deformable
        # conv at runtime for that frame — identical output (zeros)
        def _do_align(_):
            # flow_n2 arrives PRE-COMPOSED (compose_second_order_flows);
            # warp both propagated feature sets in ONE batched gather
            both = flow_warp(
                jnp.concatenate([prop_n1, prop_n2], axis=0),
                (jnp.concatenate([f1x, f2x], axis=0),
                 jnp.concatenate([f1y, f2y], axis=0)),
            )
            cond_n1, cond_n2 = jnp.split(both, 2, axis=0)
            hh = conv(jnp.concatenate([cond_n1, cond_n2], axis=-1), k0_ser)
            hh = leaky_relu(hh + hoist[..., :c], 0.1)
            hh = leaky_relu(conv(hh, k1) + b1.astype(dt), 0.1)
            hh = leaky_relu(conv(hh, k2) + b2.astype(dt), 0.1)
            out = conv(hh, ko_p) + bo_p.astype(dt)
            koff = 9 * (g // 2)
            return apply_deform_align(
                jnp.concatenate([prop_n1, prop_n2], axis=-1),
                out[..., :2 * koff], out[..., 2 * koff:4 * koff],
                out[..., 4 * koff:],
                (f1x, f1y), (f2x, f2y), wal, bal,
                max_residue_magnitude=max_residue_magnitude,
                dcn_patch_size=dcn_patch_size, dcn_impl=dcn_impl,
                dtype=dt).astype(prop_n1.dtype)

        prop = lax.cond(
            idx > 0, _do_align,
            lambda _: jnp.zeros(prop_n1.shape[:-1] + (c,), prop_n1.dtype),
            None)
        # backbone: lrelu(conv_in) + ResidualBlockNoBN (serial half of
        # conv_in = the prop block; feat/extra half arrives via hoist)
        r = leaky_relu(conv(prop, kin_ser) + hoist[..., c:], 0.1)
        rb = conv(jax.nn.relu(conv(r, kb1) + bb1.astype(dt)), kb2) \
            + bb2.astype(dt)
        prop_out = ((prop + (r + rb)) * wt.astype(prop.dtype)) \
            .astype(prop_n1.dtype)
        return (prop_out, prop_n1), prop_out

    init = (
        jnp.zeros((b, h, w, c), feats_t.dtype),
        jnp.zeros((b, h, w, c), feats_t.dtype),
    )
    # NOTE: feats_t/extra_t are NOT scan xs — after the hoist their only
    # consumers are the batched convs above, so the scan stages neither
    # (T, B, H, W, C) stream (the r4 nn.scan staged both per branch)
    _, ys = lax.scan(body, init, (hoist_t, f1_t, f2_t, w_t, idxs))
    return ys


class BasicVSRPP(nn.Module):
    """Bidirectional second-order propagation (unet.py:313-595).

    ``__call__(hidden, flows_forward, flows_backward, weight)``:
    - hidden: (B, T, H, W, C) features to refine.
    - flows_*: (B, T-1, H, W, 2) from ops/spynet (precomputed).
    - weight: per-frame gating (B, T, 1, 1, 1) or spatial map
      (B, T, H, W, 1); defaults to 1 (face-region weights,
      scripts/video_sample.py:427-444).
    Returns hidden + zero-init-conv(reconstruction(cat(spatial, bwd, fwd))).
    """

    features: int
    max_residue_magnitude: float = 10.0
    deform_groups: int = 16
    dcn_patch_size: Any = "auto"  # see SecondOrderDeformableAlignment
    dcn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden: Array,
        flows_forward: Array,
        flows_backward: Array,
        weight: Optional[Array] = None,
        flows_forward2: Optional[Array] = None,
        flows_backward2: Optional[Array] = None,
    ) -> Array:
        b, t, h, w, c = hidden.shape
        if weight is None:
            weight = jnp.ones((b, t, 1, 1, 1), hidden.dtype)
        else:
            if weight.ndim == 5 and weight.shape[2] not in (1, h):
                weight = resize_weight_map(weight, h, w)
            # the gating multiply runs in the trunk dtype (the reference's
            # fp16 trunk multiplies fp16 feat_prop by the mask weights,
            # unet.py:489 under autocast); f32 maps in a bf16 trunk would
            # otherwise promote the scan carry and crash lax.scan
            weight = weight.astype(hidden.dtype)

        zeros_flow = jnp.zeros((b, 1, h, w, 2), hidden.dtype)
        idxs = jnp.arange(t)
        if flows_forward2 is None or flows_backward2 is None:
            # not precomputed (direct callers / legacy 2-tuple flows):
            # compose here — still one batched warp per branch, OUTSIDE
            # the frame scan (the production path precomputes these once
            # per window in the model flows dict)
            flows_forward2, flows_backward2 = compose_second_order_flows(
                flows_forward, flows_backward)

        # branch params: shell modules register the exact r1-r4 tree
        # (converted checkpoints + archived goldens load unchanged); the
        # scan itself is a pure function over the raw arrays
        pb = _BranchParams(c, 2 * c, self.deform_groups,
                           name="backward_1")()
        pf = _BranchParams(c, 3 * c, self.deform_groups,
                           name="forward_1")()
        cfg = dict(
            deform_groups=self.deform_groups,
            max_residue_magnitude=self.max_residue_magnitude,
            dcn_patch_size=self.dcn_patch_size,
            dcn_impl=self.dcn_impl,
            dtype=self.dtype,
        )

        # scan xs with a trailing 2/1-wide dim are stored component-packed
        # (T, B, 2|1, H, W) — see _run_branch for why
        def pack(v):  # (T*, B, H, W, k) -> (T*, B, k, H, W)
            return jnp.moveaxis(v, -1, 2)

        # --- backward branch: frames T-1 → 0 --------------------------------
        # flow_n1 at position i (frame j=T-1-i) is flows_backward[:, j];
        # flow_n2 is the PRE-COMPOSED second-order flow for frame j.
        fb = jnp.moveaxis(flows_backward, 1, 0)  # (T-1, B, H, W, 2)
        fb_n1 = jnp.concatenate(
            [fb, jnp.moveaxis(zeros_flow, 1, 0)], axis=0
        )[::-1]
        fb_n2 = jnp.moveaxis(flows_backward2, 1, 0)[::-1]
        feats_rev = jnp.moveaxis(hidden, 1, 0)[::-1]
        w_rev = jnp.moveaxis(weight, 1, 0)[::-1]
        bwd = _run_branch(
            pb, feats_rev, None, pack(fb_n1), pack(fb_n2), pack(w_rev),
            idxs, **cfg)
        bwd = jnp.moveaxis(bwd[::-1], 0, 1)  # (B, T, H, W, C)

        # --- forward branch: frames 0 → T-1 ---------------------------------
        ff = jnp.moveaxis(flows_forward, 1, 0)
        ff_n1 = jnp.concatenate([jnp.moveaxis(zeros_flow, 1, 0), ff], axis=0)
        ff_n2 = jnp.moveaxis(flows_forward2, 1, 0)
        feats_fwd = jnp.moveaxis(hidden, 1, 0)
        extra_fwd = jnp.moveaxis(bwd, 1, 0)
        fwd = _run_branch(
            pf, feats_fwd, extra_fwd, pack(ff_n1), pack(ff_n2),
            pack(jnp.moveaxis(weight, 1, 0)), idxs, **cfg)
        fwd = jnp.moveaxis(fwd, 0, 1)

        # --- reconstruction (unet.py:494-530) -------------------------------
        hr = jnp.concatenate([hidden, bwd, fwd], axis=-1)
        hr = ResidualBlocksWithInputConv(
            c, 1, dtype=self.dtype, name="reconstruction"
        )(hr.reshape(b * t, h, w, 3 * c))
        hr = nn.Conv(
            c, (1, 1),
            kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_last",
        )(hr)
        return hidden + hr.reshape(b, t, h, w, c)


register_model("basicvsrpp")(BasicVSRPP)
