"""VQFR v2 alternative face prior (re-design of vqfr.py:11-586).

VQ-GAN encoder/decoder + a parallel "main" decoder whose features are
texture-warped onto the degraded input via deformable convolution at every
scale (TextureWarpingModule). The deformable conv uses ops.deform — the
TPU-native replacement for both the bundled dcn/ CUDA extension the
reference loads (vqfr.py:8, dcn/deform_conv.py:33-379) and torchvision's
kernel (SURVEY.md rows #28-29).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform import modulated_deform_conv2d
from ..ops.resize import resize_bilinear
from .codeformer import CFAttnBlock, CFDownsample, CFUpsample, GNorm
from .registry import register_model

Array = jax.Array


def _silu(x):
    return x * jax.nn.sigmoid(x)


class VQFRResBlock(nn.Module):
    """norm→SiLU→conv ×2 + 1x1 skip (vqfr.py:107-139)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = GNorm(name="norm1")(x)
        h = _silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        h = GNorm(name="norm2")(h)
        h = _silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="residual_func")(x)
        return x + h


class L2VectorQuantizer(nn.Module):
    """Nearest-code quantiser with straight-through (vqfr.py:11-77)."""

    num_code: int = 1024
    code_dim: int = 256

    @nn.compact
    def __call__(self, z):
        emb = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / self.num_code, 1.0 / self.num_code
            ),
            (self.num_code, self.code_dim),
        )
        flat = z.reshape(-1, self.code_dim).astype(jnp.float32)
        d = (
            (flat**2).sum(-1, keepdims=True)
            + (emb**2).sum(-1)
            - 2 * flat @ emb.T
        )
        idx = jnp.argmin(d, axis=-1)
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape).astype(z.dtype)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + 0.25 * jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)
        return z_q, loss, idx.reshape(z.shape[0], -1)

    def get_feature(self, indices, shape):
        emb = self.get_variable("params", "embedding")
        return jnp.take(emb, indices.reshape(-1), axis=0).reshape(shape)


class VQGANEncoder(nn.Module):
    """(vqfr.py:190-259)."""

    base_channels: int
    channel_multipliers: Sequence[int]
    num_blocks: int
    use_attention: bool
    code_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cm = self.channel_multipliers
        x = nn.Conv(self.base_channels * cm[0], (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv_in")(x)
        for i in range(len(cm)):
            if i != 0:
                x = CFDownsample(self.dtype, name=f"down{i}")(x)
            ch = self.base_channels * cm[i]
            for j in range(self.num_blocks):
                x = VQFRResBlock(ch, self.dtype, name=f"block{i}_{j}")(x)
                if i == len(cm) - 1 and self.use_attention:
                    x = CFAttnBlock(self.dtype, name=f"attn{i}_{j}")(x)
        ch = self.base_channels * cm[-1]
        x = VQFRResBlock(ch, self.dtype, name="mid1")(x)
        if self.use_attention:
            x = CFAttnBlock(self.dtype, name="mid_attn")(x)
        x = VQFRResBlock(ch, self.dtype, name="mid2")(x)
        x = GNorm(name="norm_out")(x)
        x = _silu(x)
        return nn.Conv(self.code_dim, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(x)


class VQGANDecoder(nn.Module):
    """(vqfr.py:262-339). Returns (rgb, {Level_2^i: feat})."""

    base_channels: int
    channel_multipliers: Sequence[int]
    num_blocks: int
    use_attention: bool
    code_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, return_feat: bool = False):
        cm = self.channel_multipliers
        ch = self.base_channels * cm[-1]
        x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        x = VQFRResBlock(ch, self.dtype, name="mid1")(x)
        if self.use_attention:
            x = CFAttnBlock(self.dtype, name="mid_attn")(x)
        x = VQFRResBlock(ch, self.dtype, name="mid2")(x)
        feats: Dict[str, Array] = {}
        for i in reversed(range(len(cm))):
            if i != len(cm) - 1:
                x = CFUpsample(self.dtype, name=f"up{i}")(x)
            ch = self.base_channels * cm[i]
            for j in range(self.num_blocks):
                x = VQFRResBlock(ch, self.dtype, name=f"block{i}_{j}")(x)
                if i == len(cm) - 1 and self.use_attention:
                    x = CFAttnBlock(self.dtype, name=f"attn{i}_{j}")(x)
            feats[f"Level_{2**i}"] = x
        if return_feat:
            return x, feats
        return x


class DecoderOut(nn.Module):
    """Shared norm→SiLU→3-ch conv head (decoder.conv_out, reused by the main
    branch at vqfr.py:581-584)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = GNorm(name="norm_out")(x)
        x = _silu(x)
        return nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(x)


class DCNv2Pack(nn.Module):
    """Offset-predicting modulated deformable conv (dcn/deform_conv.py
    DCNv2Pack semantics, used at vqfr.py:341-379)."""

    features: int
    deformable_groups: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, feat):
        g = self.deformable_groups
        out = nn.Conv(27 * g, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv_offset")(feat)
        b, h, w, _ = out.shape
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1).astype(jnp.float32)
        offset = offset.reshape(b, h, w, g, 9, 2)
        mask = jax.nn.sigmoid(mask.astype(jnp.float32)).reshape(b, h, w, g, 9)
        weight = self.param(
            "weight", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        y = modulated_deform_conv2d(
            x.astype(jnp.float32), offset, mask, weight, bias, padding=1
        )
        return y.astype(x.dtype)


class TextureWarpingModule(nn.Module):
    """(vqfr.py:382-426)."""

    channel: int
    cond_downscale_rate: int
    deformable_groups: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_main, inpfeat, previous_offset=None):
        h, w = inpfeat.shape[1:3]
        r = self.cond_downscale_rate
        cond = resize_bilinear(inpfeat, (h // r, w // r))
        c = self.channel
        o = jnp.concatenate([cond, x_main], axis=-1)
        o = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="off1_0")(o)
        o = _silu(GNorm(name="off1_n0")(o))
        o = nn.Conv(c, (7, 7), padding="SAME", feature_group_count=c,
                    dtype=self.dtype, param_dtype=jnp.float32, name="off1_1")(o)
        o = _silu(GNorm(name="off1_n1")(o))
        o = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    name="off1_2")(o)
        if previous_offset is not None:
            o = jnp.concatenate([o, previous_offset], axis=-1)
        o = nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="off2")(o)
        o = _silu(GNorm(name="off2_n")(o))
        warp = DCNv2Pack(c, self.deformable_groups, self.dtype, name="dcn")(
            x_main, o
        )
        return warp, o


@register_model("vqfr")
class VQFRv2(nn.Module):
    """Full VQFR (vqfr.py:491-586). Input (B, S, S, 3); returns a dict with
    enc_feat / texture_dec / main_dec (and quant_logit in Predict mode)."""

    base_channels: int = 64
    channel_multipliers: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_enc_blocks: int = 2
    use_enc_attention: bool = True
    num_dec_blocks: int = 2
    use_dec_attention: bool = True
    code_dim: int = 256
    inpfeat_dim: int = 32
    code_selection_mode: str = "Predict"  # 'Nearest' | 'Predict'
    deformable_groups: int = 4
    num_code: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_lq, fidelity_ratio: float = 1.0):
        cm = self.channel_multipliers
        res: Dict[str, Array] = {}
        inp_feat = nn.Conv(self.inpfeat_dim, (3, 3), padding="SAME",
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name="inpfeat_extraction")(x_lq)
        enc_feat = VQGANEncoder(
            self.base_channels, cm, self.num_enc_blocks,
            self.use_enc_attention, self.code_dim, self.dtype, name="encoder",
        )(x_lq)
        res["enc_feat"] = enc_feat

        quantizer = L2VectorQuantizer(
            self.num_code, self.code_dim, name="quantizer"
        )
        b, hq, wq, _ = enc_feat.shape
        if self.code_selection_mode == "Predict":
            tok = enc_feat.reshape(b, hq * wq, self.code_dim)
            tok = nn.LayerNorm(param_dtype=jnp.float32, name="feat2index_norm")(tok)
            logit = nn.Dense(self.num_code, dtype=self.dtype,
                             param_dtype=jnp.float32, name="feat2index")(tok)
            res["quant_logit"] = logit
            idx = jnp.argmax(logit, axis=-1)
            # bind the quantizer params by calling it once
            _ = quantizer(enc_feat)
            quant_feat = quantizer.get_feature(
                idx, (b, hq, wq, self.code_dim)
            ).astype(enc_feat.dtype)
        else:
            quant_feat, _, _ = quantizer(enc_feat)

        decoder = VQGANDecoder(
            self.base_channels, cm, self.num_dec_blocks,
            self.use_dec_attention, self.code_dim, self.dtype, name="decoder",
        )
        dec_x, texture_feats = decoder(
            jax.lax.stop_gradient(quant_feat), return_feat=True
        )
        out_head = DecoderOut(self.dtype, name="decoder_out")
        res["texture_dec"] = out_head(dec_x)

        # main branch (vqfr.py:429-488)
        n = len(cm)
        x, offset = TextureWarpingModule(
            self.base_channels * cm[-1], 2 ** (n - 1),
            self.deformable_groups, self.dtype,
            name=f"align_Level_{2**(n-1)}",
        )(texture_feats[f"Level_{2**(n-1)}"], inp_feat)
        for i in reversed(range(n - 1)):
            ch = self.base_channels * cm[i]
            x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
            x = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"pre_up_{2**i}")(x)
            up_off = resize_bilinear(
                offset, (offset.shape[1] * 2, offset.shape[2] * 2)
            ) * 2.0
            warp_feat, offset = TextureWarpingModule(
                ch, 2**i, self.deformable_groups, self.dtype,
                name=f"align_Level_{2**i}",
            )(texture_feats[f"Level_{2**i}"], inp_feat, up_off)
            x = VQFRResBlock(ch, self.dtype, name=f"dec_Level_{2**i}")(
                jnp.concatenate([x, warp_feat], axis=-1)
            )
        main_feature = texture_feats["Level_1"] + fidelity_ratio * x
        res["main_dec"] = out_head(main_feature)
        return res
