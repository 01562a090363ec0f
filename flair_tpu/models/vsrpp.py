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
  (unet.py:313-595). The Python frame loop becomes ``nn.scan`` so the whole
  bidirectional propagation is two fused XLA while-loops; flows are taken
  precomputed (compute once per resolution and share across blocks — the
  reference recomputes identical flows per block).

Convention: hidden features (B, T, H, W, C); flows (B, T-1, H, W, 2) with
flow[..., 0] = dx.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform import deform_conv2d_patch, modulated_deform_conv2d
from ..ops.dcn_pallas import (
    _materialize_raw, deform_conv2d_tile_raw_ad)
from ..ops.warp import flow_warp
from .common import leaky_relu
from .registry import register_model

# one-shot process-level notice that 'auto' picked the tile DCN kernel
_TILE_NOTICE: list = []


def _tile_config(pty: int, ca: int = 64):
    """Tile-DCN kernel configuration: (tile, patch, ntb, lane_slice).

    Default is the round-3 measured winner ((2,4)/(pty,32); sweep v2 in
    PERF.md — larger tiles lose to window-MAC inflation once the layout
    fix removed the fixed-cost tax). Override with
    FLAIR_DCN_TILE="ty,tx,pty_pad,ptx,ntb[,lane]" to flip on a
    tools/profile_ops.py `tile` sweep winner without code edits —
    ``pty_pad`` is ADDED to the M-derived patch height (so one env value
    serves both the SR3 M=5/pty=16 and ADM M=10/pty=24 routings).
    ``ca`` is the per-anchor channel width (cin // 2)."""
    import os

    env = os.environ.get("FLAIR_DCN_TILE")
    if not env:
        # ntb: measured per shape class (bigntb probe, PERF.md round 3) —
        # cin=256 sites (ca=128, xpack=1) run faster AND halve the patch
        # scratch at ntb=8 (13.4 vs 18.3 ms at 256²); cin=128 sites keep
        # ntb=16 (67.5 vs 74.3 at ntb8). The tall ADM patch (pty>16) also
        # rides ntb=8: ntb=16 needs 17.64 M scoped VMEM (16 M limit).
        ntb = 8 if (ca == 128 or pty > 16) else 16
        return (2, 4), (pty, 32), ntb, False
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
        return (2, 4), (pty, 32), 16, False
    return (ty, tx), (pty + pty_pad, ptx), ntb, lane

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

    def _patch_size(self) -> Optional[int]:
        if self.dcn_patch_size == "auto":
            import math

            return min(2 * math.ceil(self.max_residue_magnitude) + 4, 16)
        return self.dcn_patch_size

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
        # offset_out channels natively interleave (group, tap, y|x) per
        # anchor half (reference layout, unet.py:636-645); permute the conv
        # WEIGHT so the y/x planes come out contiguous — the (B,H,W,G,K,2)
        # stack + two stride-2 slices the DCN coordinate prep paid per call
        # become free contiguous slices (split offsets feed the tile kernel
        # directly; the stacked form is rebuilt only for the fallbacks)
        import numpy as _np

        nch = 27 * g  # = (g/2 groups)·9 taps·2 comps per half + 9g mask
        ko = 9 * (g // 2)
        base_c = _np.arange(ko) * 2          # y channels within one half
        perm = tuple(_np.concatenate([
            base_c, 2 * ko + base_c,              # y: half1, half2
            base_c + 1, 2 * ko + base_c + 1,      # x: half1, half2
            _np.arange(4 * ko, nch),              # mask block unchanged
        ]).tolist())
        out = _PermutedOutConv(
            nch, perm, dtype=self.dtype, name="offset_out")(h)
        b, hh, ww, _ = out.shape
        # PRE-ACTIVATION channel blocks, channel order (half, group, tap).
        # They stay raw + channel-flat all the way into the tile kernel's
        # lane permute: materialized (…,g,9) offsets get a K=9-minor
        # padded layout (+32 ms copy +30 ms reshape per tensor per 512²
        # call, round-4 trace), and f32 offsets force a 3-pass
        # Precision.HIGH permute where raw bf16 rides a single-pass dot.
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
        # value path runs in the module dtype (the reference runs the trunk —
        # including deform_conv2d — in fp16, sr3.py:528-541); offsets/mask
        # stay f32 and the coords are kept f32 inside the kernel
        use_tile = self.dcn_impl == "tile" or (
            self.dcn_impl == "auto" and jax.default_backend() == "tpu"
        )
        # the gate must imply EVERY deform_conv2d_tile precondition, so odd
        # resolutions fall back to the patch path instead of tracing into a
        # kernel AssertionError. For config (ty,tx)/(pty,ptx)/ntb:
        #   h%ty==0, w%tx==0, ca=cin/2 ∈ {64,128},
        #   ptx % (16·xpack) == 0 and (w + 2·ptx) % (8·xpack) == 0 (HBM
        #   sublane tiling of the padded packed operand; xpack = 128/ca),
        #   n_tiles = b·(h/ty)·(w/tx) divisible by ntb.
        _pty0 = 16 if self.max_residue_magnitude <= 5 else 24
        (_ty, _tx), (_, _ptx), _ntb, _ = _tile_config(
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
        if use_tile and self.dcn_impl == "auto" and not _TILE_NOTICE:
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
        if use_tile:
            pty = 16 if self.max_residue_magnitude <= 5 else 24
            tile_t, patch_p, ntb_n, lane = _tile_config(
                pty, x.shape[-1] // 2)
            y = deform_conv2d_tile_raw_ad(
                x.astype(self.dtype), raw_y, raw_x, mask_logits,
                flow_y, flow_x,
                weight, bias, float(self.max_residue_magnitude),
                tile_t, patch_p, ntb_n, lane,
            )
            return y.astype(x.dtype)
        # fallback paths take stacked (B,H,W,g,9,2) offsets + 5-D mask
        off, mask = _materialize_raw(
            raw_y, raw_x, mask_logits, flow_y, flow_x,
            self.max_residue_magnitude)
        ps = self._patch_size()
        if ps is not None:
            # fast path: one (ps,ps,C/2) patch per (pixel, flow half) anchored
            # at floor(flow) covers all taps' bilinear corners (PERF.md)
            anchor = jnp.stack(
                [flow_y, flow_x], axis=-1
            )  # (B,H,W,A,2) in (dy,dx)
            y = deform_conv2d_patch(
                x.astype(self.dtype), anchor, off, weight, bias,
                mask=mask, patch_size=ps,
            )
        else:
            y = modulated_deform_conv2d(
                x.astype(self.dtype), off, mask, weight, bias, padding=1
            )
        return y.astype(x.dtype)


class _PropStep(nn.Module):
    """One step of a propagation branch, scanned over frames."""

    features: int
    max_residue_magnitude: float
    deform_groups: int = 16
    dcn_patch_size: Any = "auto"
    dcn_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, xs):
        prop_n1, prop_n2 = carry
        feat_current, extra, flow_n1, flow_n2, weight_t, idx = xs
        # flows/weights arrive component-packed (B, 2|1, H, W) — a trailing
        # size-2/1 lane dim on the scan's stacked xs makes XLA materialize
        # 64-128×-padded remat copies (measured: two 2.5 G copies of
        # f32[T,B,H,W,2] per step at 512²). The components stay SEPARATE
        # (B, H, W) planes from here to the warp/kernel — re-packing them
        # channel-last just to re-slice cost ~8 ms/step of strided async
        # DMA per consumer at 512² (round-4 trace)
        f1x, f1y = flow_n1[:, 0], flow_n1[:, 1]
        f2x, f2y = flow_n2[:, 0], flow_n2[:, 1]
        weight_t = jnp.moveaxis(weight_t, 1, -1)
        c = self.features

        align = SecondOrderDeformableAlignment(
            c,
            deform_groups=self.deform_groups,
            max_residue_magnitude=self.max_residue_magnitude,
            dcn_patch_size=self.dcn_patch_size,
            dcn_impl=self.dcn_impl,
            dtype=self.dtype,
            name="deform_align",
        )

        # the reference computes the full alignment for the FIRST scanned
        # frame too and multiplies it by zero (unet.py:471-489 `if idx > 0`
        # guard is outside the flow/DCN math in the scanned formulation);
        # lax.cond skips the three flow warps + offset convs + deformable
        # conv at runtime for that frame — identical output (zeros), ~10%
        # of the per-step DCN cost at win=10
        def _do_align(mod):
            # flow_n2 arrives PRE-COMPOSED (second-order composition is
            # window-constant — compose_second_order_flows), so the scan
            # body does no flow warping beyond the feature warp below
            # warp both propagated feature sets in ONE batched gather
            # (identical math to two flow_warp calls — per-batch-element
            # independent): halves the feature-warp launch/fixed cost,
            # which profile_step showed dominating the 0.69 s/step
            # flow_warp bucket
            both = flow_warp(
                jnp.concatenate([prop_n1, prop_n2], axis=0),
                (jnp.concatenate([f1x, f2x], axis=0),
                 jnp.concatenate([f1y, f2y], axis=0)),
            )
            cond_n1, cond_n2 = jnp.split(both, 2, axis=0)
            cond = jnp.concatenate(
                [cond_n1, feat_current, cond_n2], axis=-1)
            packed = jnp.concatenate([prop_n1, prop_n2], axis=-1)
            return mod(packed, cond, (f1x, f1y),
                       (f2x, f2y)).astype(prop_n1.dtype)

        def _skip_align(mod):
            return jnp.zeros(prop_n1.shape[:-1] + (c,), prop_n1.dtype)

        if self.is_initializing():
            prop = _do_align(align)  # create align variables unconditionally
        else:
            prop = nn.cond(idx > 0, _do_align, _skip_align, align)

        feat_in = jnp.concatenate([feat_current, extra, prop], axis=-1)
        prop = prop + ResidualBlocksWithInputConv(
            c, 1, dtype=self.dtype, name="backbone"
        )(feat_in)
        prop = prop * weight_t
        return (prop, prop_n1), prop


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

        # scan xs with a trailing 2/1-wide dim are stored component-packed
        # (T, B, 2|1, H, W) — see _PropStep.__call__ for why
        def pack(v):  # (T*, B, H, W, k) -> (T*, B, k, H, W)
            return jnp.moveaxis(v, -1, 2)

        scan = nn.scan(
            _PropStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )

        # --- backward branch: frames T-1 → 0 --------------------------------
        # flow_n1 at position i (frame j=T-1-i) is flows_backward[:, j];
        # flow_n2 is the PRE-COMPOSED second-order flow for frame j.
        fb = jnp.moveaxis(flows_backward, 1, 0)  # (T-1, B, H, W, 2)
        # step i processes frame j = T-1-i; flow_n1 = flows_backward[j]
        # (zeros at i=0)
        fb_n1 = jnp.concatenate(
            [fb, jnp.moveaxis(zeros_flow, 1, 0)], axis=0
        )[::-1]
        fb_n2 = jnp.moveaxis(flows_backward2, 1, 0)[::-1]
        feats_rev = jnp.moveaxis(hidden, 1, 0)[::-1]
        w_rev = jnp.moveaxis(weight, 1, 0)[::-1]
        extra_empty = jnp.zeros((t, b, h, w, 0), hidden.dtype)
        init = (
            jnp.zeros((b, h, w, c), hidden.dtype),
            jnp.zeros((b, h, w, c), hidden.dtype),
        )
        _, bwd = scan(
            self.features,
            self.max_residue_magnitude,
            self.deform_groups,
            self.dcn_patch_size,
            self.dcn_impl,
            self.dtype,
            name="backward_1",
        )(init, (feats_rev, extra_empty, pack(fb_n1), pack(fb_n2),
                 pack(w_rev), idxs))
        bwd = jnp.moveaxis(bwd[::-1], 0, 1)  # (B, T, H, W, C)

        # --- forward branch: frames 0 → T-1 ---------------------------------
        ff = jnp.moveaxis(flows_forward, 1, 0)
        ff_n1 = jnp.concatenate([jnp.moveaxis(zeros_flow, 1, 0), ff], axis=0)
        ff_n2 = jnp.moveaxis(flows_forward2, 1, 0)
        feats_fwd = jnp.moveaxis(hidden, 1, 0)
        extra_fwd = jnp.moveaxis(bwd, 1, 0)
        w_fwd = jnp.moveaxis(weight, 1, 0)
        _, fwd = scan(
            self.features,
            self.max_residue_magnitude,
            self.deform_groups,
            self.dcn_patch_size,
            self.dcn_impl,
            self.dtype,
            name="forward_1",
        )(init, (feats_fwd, extra_fwd, pack(ff_n1), pack(ff_n2),
                 pack(w_fwd), idxs))
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
