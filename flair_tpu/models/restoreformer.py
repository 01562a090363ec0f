"""RestoreFormer alternative face prior (re-design of restoreformer.py:7-861).

Multi-head cross-attention VQ-VAE-GAN: the encoder stores per-level features
("hs"), and the transformer decoder's attention blocks CROSS-attend — queries
come from the decoder stream, keys/values from the matching encoder feature
(restoreformer.py:636-672). Decoder attention runs at one extra scale than
the encoder (ex_multi_scale_num, restoreformer.py:807-809).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .codeformer import GNorm
from .registry import register_model

Array = jax.Array


def _swish(x):
    return x * jax.nn.sigmoid(x)


class RFResBlock(nn.Module):
    """norm→swish→conv ×2, nin shortcut (restoreformer.py:158-215)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = GNorm(name="norm1")(x)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        h = GNorm(name="norm2")(h)
        h = _swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="nin_shortcut")(x)
        return x + h


class MultiHeadAttnBlock(nn.Module):
    """Self/cross attention: q from ``y`` (or x), k/v from x
    (restoreformer.py:218-285)."""

    head_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y: Optional[Array] = None):
        b, h, w, c = x.shape
        hs = self.head_size
        d = c // hs
        hx = GNorm(name="norm1")(x)
        hy = hx if y is None else GNorm(name="norm2")(y)
        conv = lambda n: nn.Conv(c, (1, 1), dtype=self.dtype,
                                 param_dtype=jnp.float32, name=n)
        q = conv("q")(hy).reshape(b, h * w, hs, d)
        k = conv("k")(hx).reshape(b, h * w, hs, d)
        v = conv("v")(hx).reshape(b, h * w, hs, d)
        logits = jnp.einsum("bqnd,bknd->bnqk", q, k).astype(jnp.float32)
        probs = jax.nn.softmax(logits / math.sqrt(d), axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", probs.astype(v.dtype), v)
        out = conv("proj_out")(out.reshape(b, h, w, c))
        return x + out


class RFDown(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)


class RFUp(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, 1), 2, 2)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class MultiHeadEncoder(nn.Module):
    """(restoreformer.py:288-413). Returns the hs feature dict."""

    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    z_channels: int = 256
    double_z: bool = False
    enable_mid: bool = True
    head_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, Array]:
        hs: Dict[str, Array] = {}
        curr = x.shape[1]
        h = nn.Conv(self.ch, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        hs["in"] = h
        n = len(self.ch_mult)
        for i in range(n):
            out_ch = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                h = RFResBlock(out_ch, self.dtype, name=f"down{i}_block{j}")(h)
                if curr in self.attn_resolutions:
                    h = MultiHeadAttnBlock(
                        self.head_size, self.dtype, name=f"down{i}_attn{j}"
                    )(h)
            if i != n - 1:
                hs[f"block_{i}"] = h
                h = RFDown(self.dtype, name=f"down{i}_ds")(h)
                curr //= 2
        if self.enable_mid:
            h = RFResBlock(h.shape[-1], self.dtype, name="mid_block1")(h)
            hs[f"block_{n-1}_atten"] = h
            h = MultiHeadAttnBlock(self.head_size, self.dtype, name="mid_attn")(h)
            h = RFResBlock(h.shape[-1], self.dtype, name="mid_block2")(h)
            hs["mid_atten"] = h
        h = GNorm(name="norm_out")(h)
        h = _swish(h)
        zc = 2 * self.z_channels if self.double_z else self.z_channels
        hs["out"] = nn.Conv(zc, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32, name="conv_out")(h)
        return hs


class MultiHeadDecoderTransformer(nn.Module):
    """(restoreformer.py:543-675). Cross-attends to encoder hs."""

    ch: int = 64
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16, 32)
    enable_mid: bool = True
    head_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, hs: Dict[str, Array]):
        n = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr = z.shape[1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z)
        if self.enable_mid:
            h = RFResBlock(block_in, self.dtype, name="mid_block1")(h)
            h = MultiHeadAttnBlock(self.head_size, self.dtype, name="mid_attn")(
                h, hs["mid_atten"]
            )
            h = RFResBlock(block_in, self.dtype, name="mid_block2")(h)
        for i in reversed(range(n)):
            out_ch = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = RFResBlock(out_ch, self.dtype, name=f"up{i}_block{j}")(h)
                if curr in self.attn_resolutions:
                    key = (
                        f"block_{i}_atten"
                        if f"block_{i}_atten" in hs
                        else f"block_{i}"
                    )
                    h = MultiHeadAttnBlock(
                        self.head_size, self.dtype, name=f"up{i}_attn{j}"
                    )(h, hs[key])
            if i != 0:
                h = RFUp(self.dtype, name=f"up{i}_us")(h)
                curr *= 2
        h = GNorm(name="norm_out")(h)
        h = _swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(h)


class RFVectorQuantizer(nn.Module):
    """(restoreformer.py:7-119)."""

    n_e: int = 1024
    e_dim: int = 256
    beta: float = 0.25

    @nn.compact
    def __call__(self, z):
        emb = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32, -1.0 / self.n_e, 1.0 / self.n_e
            ),
            (self.n_e, self.e_dim),
        )
        flat = z.reshape(-1, self.e_dim).astype(jnp.float32)
        d = (
            (flat**2).sum(-1, keepdims=True) + (emb**2).sum(-1)
            - 2 * flat @ emb.T
        )
        idx = jnp.argmin(d, axis=-1)
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape).astype(z.dtype)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + self.beta * jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)
        one_hot = jax.nn.one_hot(idx, self.n_e)
        e_mean = one_hot.mean(0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        return z_q, loss, (perplexity, idx)


@register_model("restoreformer")
class RestoreFormer(nn.Module):
    """VQVAEGANMultiHeadTransformer (restoreformer.py:764-861).

    Returns (dec, codebook_loss, info, hs)."""

    n_embed: int = 1024
    embed_dim: int = 256
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    z_channels: int = 256
    head_size: int = 4
    ex_multi_scale_num: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hs = MultiHeadEncoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            z_channels=self.z_channels, head_size=self.head_size,
            dtype=self.dtype, name="encoder",
        )(x)
        h = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="quant_conv")(hs["out"])
        quant, emb_loss, info = RFVectorQuantizer(
            self.n_embed, self.embed_dim, name="quantize"
        )(h)
        quant = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="post_quant_conv")(quant)
        dec_attn = list(self.attn_resolutions)
        for _ in range(self.ex_multi_scale_num):
            dec_attn = [dec_attn[0], dec_attn[-1] * 2]
        dec = MultiHeadDecoderTransformer(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(dec_attn),
            head_size=self.head_size, dtype=self.dtype, name="decoder",
        )(quant, hs)
        return dec, emb_loss, info, hs


class MultiHeadDecoder(nn.Module):
    """Plain (self-attention-only) decoder variant (restoreformer.py:415-541)
    — same topology as MultiHeadDecoderTransformer without the encoder
    cross-attention."""

    ch: int = 64
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    enable_mid: bool = True
    head_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        n = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        curr = z.shape[1]
        h = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(z)
        if self.enable_mid:
            h = RFResBlock(block_in, self.dtype, name="mid_block1")(h)
            h = MultiHeadAttnBlock(self.head_size, self.dtype,
                                   name="mid_attn")(h)
            h = RFResBlock(block_in, self.dtype, name="mid_block2")(h)
        for i in reversed(range(n)):
            out_ch = self.ch * self.ch_mult[i]
            for j in range(self.num_res_blocks + 1):
                h = RFResBlock(out_ch, self.dtype, name=f"up{i}_block{j}")(h)
                if curr in self.attn_resolutions:
                    h = MultiHeadAttnBlock(
                        self.head_size, self.dtype, name=f"up{i}_attn{j}"
                    )(h)
            if i != 0:
                h = RFUp(self.dtype, name=f"up{i}_us")(h)
                curr *= 2
        h = GNorm(name="norm_out")(h)
        h = _swish(h)
        return nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv_out")(h)


@register_model("vqvaegan")
class VQVAEGAN(nn.Module):
    """Base VQ-VAE-GAN without encoder cross-attention
    (restoreformer.py:678-762). Returns (dec, codebook_loss, info)."""

    n_embed: int = 1024
    embed_dim: int = 256
    ch: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    z_channels: int = 256
    head_size: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hs = MultiHeadEncoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            z_channels=self.z_channels, head_size=self.head_size,
            dtype=self.dtype, name="encoder",
        )(x)
        h = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="quant_conv")(hs["out"])
        quant, emb_loss, info = RFVectorQuantizer(
            self.n_embed, self.embed_dim, name="quantize"
        )(h)
        quant = nn.Conv(self.z_channels, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="post_quant_conv")(quant)
        dec = MultiHeadDecoder(
            ch=self.ch, ch_mult=self.ch_mult,
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions,
            head_size=self.head_size, dtype=self.dtype, name="decoder",
        )(quant)
        return dec, emb_loss, info
