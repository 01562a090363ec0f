"""SPyNet optical flow (JAX port of the mmedit module used by the reference).

The reference imports mmedit's ``SPyNet`` and lets each UNet own one
(unet_new.py:985, sr3.py:340-341 via BasicVSRPP). Behaviour: ImageNet
normalisation, 6-level average-pool pyramid, coarse-to-fine flow refinement
with a 5-conv module per level, inputs bilinearly resized to a multiple of 32
and the flow rescaled back (mmedit basicvsr_net.SPyNet semantics).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear
from ..ops.warp import flow_warp
from .registry import register_model

Array = jax.Array

_MEAN = jnp.array([0.485, 0.456, 0.406])
_STD = jnp.array([0.229, 0.224, 0.225])


class SPyNetBasicModule(nn.Module):
    """One pyramid level: 5 conv(7x7) stack 8→32→64→32→16→2, ReLU between."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, feats in enumerate((32, 64, 32, 16, 2)):
            x = nn.Conv(
                feats, (7, 7), padding="SAME",
                dtype=self.dtype, param_dtype=jnp.float32,
                name=f"conv{i}",
            )(x)
            if i < 4:
                x = jax.nn.relu(x)
        return x


@register_model("spynet")
class SPyNet(nn.Module):
    """6-level pyramid flow estimator.

    ``__call__(ref, supp)`` with NHWC images in [0, 1] returns flow
    (B, H, W, 2) such that ``flow_warp(supp, flow) ≈ ref`` (the convention
    BasicVSRPP depends on, unet.py:449-468).
    """

    dtype: Any = jnp.float32
    levels: int = 6

    @nn.compact
    def __call__(self, ref: Array, supp: Array) -> Array:
        b, h, w, _ = ref.shape
        h32 = -(-h // 32) * 32
        w32 = -(-w // 32) * 32
        need_resize = (h32 != h) or (w32 != w)
        if need_resize:
            ref_r = resize_bilinear(ref, (h32, w32))
            supp_r = resize_bilinear(supp, (h32, w32))
        else:
            ref_r, supp_r = ref, supp

        mean = _MEAN.astype(ref_r.dtype)
        std = _STD.astype(ref_r.dtype)
        refs = [(ref_r - mean) / std]
        supps = [(supp_r - mean) / std]
        for _ in range(self.levels - 1):
            refs.append(nn.avg_pool(refs[-1], (2, 2), (2, 2)))
            supps.append(nn.avg_pool(supps[-1], (2, 2), (2, 2)))
        refs = refs[::-1]
        supps = supps[::-1]

        modules = [
            SPyNetBasicModule(dtype=self.dtype, name=f"level{i}")
            for i in range(self.levels)
        ]
        flow = jnp.zeros(
            (b, h32 // 32, w32 // 32, 2), dtype=ref_r.dtype
        )
        for lvl in range(self.levels):
            if lvl == 0:
                flow_up = flow
            else:
                hh, ww = refs[lvl].shape[1:3]
                flow_up = _bilinear_up2_align(flow) * 2.0
            inp = jnp.concatenate(
                [
                    refs[lvl],
                    flow_warp(supps[lvl], flow_up, padding_mode="border"),
                    flow_up,
                ],
                axis=-1,
            )
            flow = flow_up + modules[lvl](inp)

        if need_resize:
            flow = resize_bilinear(flow, (h, w))
            flow = flow * jnp.array(
                [w / w32, h / h32], dtype=flow.dtype
            )
        return flow


def _bilinear_up2_align(x: Array) -> Array:
    """F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)."""
    b, h, w, c = x.shape
    ho, wo = h * 2, w * 2
    yi = jnp.arange(ho) * (h - 1) / max(ho - 1, 1)
    xi = jnp.arange(wo) * (w - 1) / max(wo - 1, 1)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (yi - y0).astype(x.dtype)[None, :, None, None]
    fx = (xi - x0).astype(x.dtype)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - fx) + x[:, y0][:, :, x1] * fx
    bot = x[:, y1][:, :, x0] * (1 - fx) + x[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def compute_flow_bidirectional(spynet, params, lqs: Array):
    """(B, T, H, W, 3) in [-1,1] → (flows_forward, flows_backward), each
    (B, T-1, H, W, 2) — BasicVSRPP.compute_flow parity (unet.py:383-404)."""
    lqs01 = jnp.clip((lqs + 1.0) / 2.0, 0.0, 1.0)
    b, t, h, w, c = lqs01.shape
    l1 = lqs01[:, :-1].reshape(b * (t - 1), h, w, c)
    l2 = lqs01[:, 1:].reshape(b * (t - 1), h, w, c)
    fwd = spynet.apply(params, l2, l1).reshape(b, t - 1, h, w, 2)
    bwd = spynet.apply(params, l1, l2).reshape(b, t - 1, h, w, 2)
    return fwd, bwd
