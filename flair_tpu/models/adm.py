"""BlurUNet — ADM/guided-diffusion-style video UNet
(re-design of unet_new.py:901-1362).

Used for the gaussian/jpeg tasks (scripts/video_sample.py:118-156):
channel_mult (0.5,1,1,2,2,4,4) × 128, learned-range variance (6 output
channels), scale-shift norm, resblock up/down, attention at ds {16,32,64},
5-frame temporal attention, BasicVSR++ at ds {1,2} with a UNet-owned SPyNet
whose flows are precomputed once per rnn resolution (unet_new.py:1283-1348).

Also provides ``SuperResModel`` and ``EncoderUNetModel`` capability parity
(unet_new.py:1365-1593).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.embed import timestep_embedding
from ..ops.resize import resize_bicubic
from .blocks import AttentionBlock, AttentionBottleBlock, ResBlock
from .common import Conv2d, Dense, GroupNorm32, silu
from .registry import register_model
from .spynet import SPyNet
from .temporal import TemporalAttention
from .vsrpp import BasicVSRPP, compose_second_order_flows

Array = jax.Array


@register_model("blur_unet")
class BlurUNet(nn.Module):
    """ADM video UNet (unet_new.py:901-1362)."""

    image_size: int = 512
    in_channels: int = 6
    model_channels: int = 128
    out_channels: int = 6
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (16, 32, 64)
    rnn_resolutions: Sequence[int] = (1, 2)  # ds factors with VSR++
    dropout: float = 0.0
    channel_mult: Sequence[float] = (0.5, 1, 1, 2, 2, 4, 4)
    conv_resample: bool = True
    num_heads: int = 1
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    temporal_block: bool = True
    temporal_frames: int = 5
    deform_groups: int = 16
    dcn_patch_size: object = "auto"
    dcn_impl: str = "auto"  # see SecondOrderDeformableAlignment
    # gradient checkpointing per block (reference demo configs run with
    # use_checkpoint=True, video_sample.py:134,154; nn_new.py checkpoint)
    use_checkpoint: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        timesteps: Array,
        low_res_input: Optional[Array] = None,
        rnn_input: Optional[Array] = None,
        enable_cross_frames: bool = True,
        vsrpp_weights: Optional[Array] = None,
        deterministic: bool = True,
        flows: Optional[dict] = None,
        compute_flows_only: bool = False,
    ) -> Array:
        """x: (B, T, H, W, 3); timesteps: (B, T) (original-schedule indices);
        low_res_input: (B, T, H, W, 3); rnn_input defaults to low_res_input.
        Returns (B, T, H, W, out_channels) — ε and variance fractions.

        ``flows``: precomputed {res: (fwd, bwd)}; they depend only on
        ``rnn_input`` (constant across a window's sampler steps), so callers
        hoist them out of the scan. ``compute_flows_only=True`` returns just
        the dict under the same param scope."""
        b, t = x.shape[0], x.shape[1]
        mc = self.model_channels
        cross = self.temporal_block and enable_cross_frames
        if low_res_input is not None:
            x = jnp.concatenate([x, low_res_input], axis=-1)
        if rnn_input is None:
            rnn_input = low_res_input

        emb = timestep_embedding(timesteps.reshape(b * t), mc)
        emb = Dense(4 * mc, name="time_embed_0")(emb)
        emb = Dense(4 * mc, name="time_embed_1")(silu(emb))
        emb = emb.reshape(b, t, 4 * mc)

        # flows once per rnn resolution (unet_new.py:1334-1348)
        if flows is None or compute_flows_only:
            flows = {}
            if cross and t > 1:
                spynet = SPyNet(name="spynet")
                need_res = [
                    self.image_size // int(s) for s in self.rnn_resolutions
                ]
                for res in need_res:
                    fi = rnn_input.astype(jnp.float32)
                    if fi.shape[2] != res:
                        fi = resize_bicubic(fi, (res, res))
                    lq01 = jnp.clip((fi + 1) / 2, 0, 1)
                    l1 = lq01[:, :-1].reshape(b * (t - 1), res, res, 3)
                    l2 = lq01[:, 1:].reshape(b * (t - 1), res, res, 3)
                    fwd = spynet(l2, l1).reshape(b, t - 1, res, res, 2)
                    bwd = spynet(l1, l2).reshape(b, t - 1, res, res, 2)
                    # second-order composition is flow-only → hoist it out
                    # of every VSR++ scan (shared by all sites at this res)
                    flows[res] = (fwd, bwd) + compose_second_order_flows(
                        fwd, bwd)
        if compute_flows_only:
            return flows

        # gating maps are window-constant too: nearest-resize ONCE per rnn
        # resolution instead of inside all 2·len(rnn_resolutions)·
        # num_res_blocks VSR++ sites at every step
        wmaps = {}
        if vsrpp_weights is not None and vsrpp_weights.ndim == 5:
            from .vsrpp import resize_weight_map

            for res in {self.image_size // int(s)
                        for s in self.rnn_resolutions}:
                wmaps[res] = (
                    vsrpp_weights if vsrpp_weights.shape[2] in (1, res)
                    else resize_weight_map(vsrpp_weights, res, res))

        # remat wrappers: recompute block activations in the backward pass
        # (512² trainability; enable flags/deterministic are trace-static)
        if self.use_checkpoint:
            RB = nn.remat(ResBlock, static_argnums=(3,))
            AB = nn.remat(AttentionBlock)
            ABB = nn.remat(AttentionBottleBlock)
            TA = nn.remat(TemporalAttention)
            VP = nn.remat(BasicVSRPP)
        else:
            RB, AB, ABB, TA, VP = (ResBlock, AttentionBlock,
                                   AttentionBottleBlock, TemporalAttention,
                                   BasicVSRPP)

        def maybe_temporal_res(h, name):
            if cross:
                out = RB(
                    h.shape[-1],
                    self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dims=3,
                    dtype=self.dtype,
                    name=name,
                )(h, emb, deterministic)
                return out
            return h

        def maybe_attn(h, ds, name, bottleneck=False):
            if ds in self.attention_resolutions or bottleneck:
                if bottleneck:
                    h = ABB(
                        h.shape[-1],
                        self.num_heads,
                        self.num_head_channels,
                        dtype=self.dtype,
                        name=name,
                    )(h, emb)
                else:
                    h = AB(
                        h.shape[-1],
                        self.num_heads,
                        self.num_head_channels,
                        dtype=self.dtype,
                        name=name,
                    )(h)
                if cross:
                    h = TA(
                        h.shape[-1],
                        num_frames=self.temporal_frames,
                        num_heads=self.num_heads,
                        num_head_channels=self.num_head_channels,
                        dtype=self.dtype,
                        name=name + "_temporal",
                    )(h)
            return h

        def maybe_vsrpp(h, ds, name):
            if ds in self.rnn_resolutions and cross:
                res = h.shape[2]
                fl = flows[res]
                h = VP(
                    h.shape[-1], deform_groups=self.deform_groups,
                    dcn_patch_size=self.dcn_patch_size,
                    dcn_impl=self.dcn_impl,
                    dtype=self.dtype, name=name,
                )(h, fl[0], fl[1], wmaps.get(res, vsrpp_weights),
                  flows_forward2=fl[2] if len(fl) > 2 else None,
                  flows_backward2=fl[3] if len(fl) > 3 else None)
            return h

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * mc)
        h = Conv2d(ch, 3, dtype=self.dtype, name="conv_in")(h)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            c = int(mult * mc)
            for i in range(self.num_res_blocks):
                h = RB(
                    c,
                    self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"in_{level}_{i}_res",
                )(h, emb, deterministic)
                h = maybe_temporal_res(h, f"in_{level}_{i}_res3d")
                h = maybe_attn(h, ds, f"in_{level}_{i}_attn")
                h = maybe_vsrpp(h, ds, f"in_{level}_{i}_vsrpp")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = RB(
                        c,
                        self.dropout,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True,
                        dtype=self.dtype,
                        name=f"in_{level}_down",
                    )(h, emb, deterministic)
                else:
                    h = Conv2d(c, 3, stride=2, padding=1, dtype=self.dtype,
                               name=f"in_{level}_down")(h)
                hs.append(h)
                ds *= 2

        # middle block (unet_new.py:1081-1134)
        h = RB(
            h.shape[-1], self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype, name="mid_res1",
        )(h, emb, deterministic)
        h = maybe_temporal_res(h, "mid_res3d_1")
        h = maybe_attn(h, ds, "mid_attn", bottleneck=True)
        h = RB(
            h.shape[-1], self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype, name="mid_res2",
        )(h, emb, deterministic)
        h = maybe_temporal_res(h, "mid_res3d_2")

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            c = int(mult * mc)
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = RB(
                    c,
                    self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype,
                    name=f"out_{level}_{i}_res",
                )(h, emb, deterministic)
                h = maybe_temporal_res(h, f"out_{level}_{i}_res3d")
                h = maybe_attn(h, ds, f"out_{level}_{i}_attn")
                h = maybe_vsrpp(h, ds, f"out_{level}_{i}_vsrpp")
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = RB(
                            c,
                            self.dropout,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True,
                            dtype=self.dtype,
                            name=f"out_{level}_up",
                        )(h, emb, deterministic)
                    else:
                        bh, t_, hh, ww, cc = h.shape
                        h2 = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
                        h = Conv2d(cc, 3, dtype=self.dtype,
                                   name=f"out_{level}_up")(h2)
                    ds //= 2

        h = h.astype(jnp.float32)
        h = GroupNorm32(32, name="out_norm")(h)
        h = silu(h)
        return Conv2d(
            self.out_channels, 3, zero_init=True, dtype=jnp.float32, name="out_conv"
        )(h)


@register_model("superres_unet")
class SuperResModel(nn.Module):
    """UNet conditioned on a low-res image upsampled to full resolution
    (unet_new.py:1365-1390 behaviour): bilinearly upsamples ``low_res`` and
    concatenates before the BlurUNet trunk."""

    unet: BlurUNet = None  # type: ignore[assignment]

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, **kwargs):
        from ..ops.resize import resize_bilinear

        inner = self.unet if self.unet is not None else BlurUNet()
        if low_res is not None:
            up = resize_bilinear(low_res, (x.shape[2], x.shape[3]))
        else:
            up = None
        return inner.copy(name="unet")(x, timesteps, low_res_input=up, **kwargs)


@register_model("encoder_unet")
class EncoderUNetModel(nn.Module):
    """Half-UNet encoder/classifier (unet_new.py:1393-1593): the downsampling
    trunk followed by pooled head ('adaptive' mean pool or 'spatial' MLP)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (16, 32)
    channel_mult: Sequence[float] = (1, 2, 4, 8)
    num_head_channels: int = 64
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    pool: str = "adaptive"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, timesteps: Array, deterministic: bool = True):
        b, t = x.shape[0], x.shape[1]
        mc = self.model_channels
        emb = timestep_embedding(timesteps.reshape(b * t), mc)
        emb = Dense(4 * mc, name="time_embed_0")(emb)
        emb = Dense(4 * mc, name="time_embed_1")(silu(emb))
        emb = emb.reshape(b, t, 4 * mc)

        h = x.astype(self.dtype)
        ch = int(self.channel_mult[0] * mc)
        h = Conv2d(ch, 3, dtype=self.dtype, name="conv_in")(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            c = int(mult * mc)
            for i in range(self.num_res_blocks):
                h = ResBlock(
                    c, use_scale_shift_norm=self.use_scale_shift_norm,
                    dtype=self.dtype, name=f"in_{level}_{i}_res",
                )(h, emb, deterministic)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(
                        c, num_head_channels=self.num_head_channels,
                        dtype=self.dtype, name=f"in_{level}_{i}_attn",
                    )(h)
            if level != len(self.channel_mult) - 1:
                h = ResBlock(
                    c, use_scale_shift_norm=self.use_scale_shift_norm,
                    down=True, dtype=self.dtype, name=f"in_{level}_down",
                )(h, emb, deterministic)
                ds *= 2
        h = ResBlock(
            h.shape[-1], use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype, name="mid_res1",
        )(h, emb, deterministic)
        h = AttentionBlock(
            h.shape[-1], num_head_channels=self.num_head_channels,
            dtype=self.dtype, name="mid_attn",
        )(h)
        h = ResBlock(
            h.shape[-1], use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype, name="mid_res2",
        )(h, emb, deterministic)

        if self.pool == "adaptive":
            h = GroupNorm32(32, name="out_norm")(h)
            h = silu(h)
            h = h.mean(axis=(2, 3))  # (B, T, C)
            return Dense(self.out_channels, zero_init=True, name="out_proj")(h)
        raise NotImplementedError(self.pool)
