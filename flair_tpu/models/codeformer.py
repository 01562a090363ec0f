"""CodeFormer GAN face prior (re-design of codeformer.py:9-753, NHWC flax).

VQ-GAN autoencoder (Encoder → VectorQuantizer → Generator) + a 9-layer
pre-LN transformer that predicts codebook indices from the degraded-face
features, optional AdaIN of the quantised features to the degraded features
(applied with adain=True in the demo, scripts/video_sample.py:451), and SFT
skip fusion of encoder features into the generator at the ``connect_list``
resolutions.

Fuse points are derived structurally (after the 2nd residual block of each
encoder level / after the 1st residual block of each generator level;
before the attention blocks at 16×16) — equivalent to the reference's
hard-coded block indices (codeformer.py:659-676).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .registry import register_model

Array = jax.Array


def swish(x):
    return x * jax.nn.sigmoid(x)


class GNorm(nn.Module):
    """GroupNorm(32, eps=1e-6, affine) (codeformer.py:9-13)."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=32, epsilon=1e-6, param_dtype=jnp.float32
        )(x)


class CFResBlock(nn.Module):
    """norm→swish→conv ×2 with 1x1 skip on channel change (codeformer.py:166-195)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        h = GNorm(name="norm1")(x)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(h)
        h = GNorm(name="norm2")(h)
        h = swish(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv2")(h)
        if c_in != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv_out")(x)
        return x + h


class CFAttnBlock(nn.Module):
    """Single-head full spatial attention, scale 1/sqrt(C) (codeformer.py:198-241)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        n = GNorm(name="norm")(x)
        conv = lambda name: nn.Conv(c, (1, 1), dtype=self.dtype,
                                    param_dtype=jnp.float32, name=name)
        q = conv("q")(n).reshape(b, h * w, c)
        k = conv("k")(n).reshape(b, h * w, c)
        v = conv("v")(n).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
            / math.sqrt(c),
            axis=-1,
        ).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = conv("proj_out")(out)
        return x + out


class CFDownsample(nn.Module):
    """Asymmetric-pad stride-2 conv (codeformer.py:138-149)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(c, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="conv")(x)


class CFUpsample(nn.Module):
    """Nearest 2x + conv (codeformer.py:152-163)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(c, (3, 3), padding="SAME", dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class VectorQuantizer(nn.Module):
    """Nearest-neighbour codebook (codeformer.py:21-94)."""

    codebook_size: int = 1024
    emb_dim: int = 256
    beta: float = 0.25

    def setup(self):
        self.embedding = self.param(
            "embedding",
            lambda k, s: jax.random.uniform(
                k, s, jnp.float32,
                -1.0 / self.codebook_size, 1.0 / self.codebook_size,
            ),
            (self.codebook_size, self.emb_dim),
        )

    def __call__(self, z):
        """z (B, H, W, C) → (z_q, loss, stats)."""
        flat = z.reshape(-1, self.emb_dim).astype(jnp.float32)
        e = self.embedding
        d = (
            (flat**2).sum(-1, keepdims=True)
            + (e**2).sum(-1)
            - 2.0 * flat @ e.T
        )
        idx = jnp.argmin(d, axis=-1)
        z_q = jnp.take(e, idx, axis=0).reshape(z.shape).astype(z.dtype)
        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + self.beta * jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)
        one_hot = jax.nn.one_hot(idx, self.codebook_size)
        e_mean = one_hot.mean(0)
        perplexity = jnp.exp(-jnp.sum(e_mean * jnp.log(e_mean + 1e-10)))
        stats = {
            "perplexity": perplexity,
            "min_encoding_indices": idx,
            "mean_distance": d.mean(),
        }
        return z_q, loss, stats

    def get_codebook_feat(self, indices, shape):
        """(B·N,) indices → (B, H, W, C) quantised features (codeformer.py:82-94)."""
        z_q = jnp.take(self.embedding, indices.reshape(-1), axis=0)
        return z_q.reshape(shape)


class GumbelQuantizer(nn.Module):
    """Gumbel-softmax codebook (codeformer.py:97-135) — VQAutoEncoder's
    alternative quantiser."""

    codebook_size: int = 1024
    emb_dim: int = 256
    num_hiddens: int = 256
    straight_through: bool = False
    kl_weight: float = 1e-8
    temp: float = 1.0

    @nn.compact
    def __call__(self, z, rng=None):
        logits = nn.Conv(self.codebook_size, (1, 1), name="proj")(z)
        embedding = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.codebook_size, self.emb_dim), jnp.float32,
        )
        if rng is None:
            soft = jax.nn.softmax(logits / self.temp, axis=-1)
        else:
            g = jax.random.gumbel(rng, logits.shape, logits.dtype)
            soft = jax.nn.softmax((logits + g) / self.temp, axis=-1)
        z_q = jnp.einsum("bhwn,nc->bhwc", soft, embedding)
        qy = jax.nn.softmax(logits, axis=-1)
        kl = self.kl_weight * jnp.mean(
            jnp.sum(qy * jnp.log(qy * self.codebook_size + 1e-10), axis=-1)
        )
        idx = jnp.argmax(soft, axis=-1)
        return z_q, kl, {"min_encoding_indices": idx}


def _encoder_plan(ch_mult, resolution):
    """[(kind, out_ch, capture_res)] list replicating Encoder block order."""
    plan = []
    curr = resolution
    for i, mult in enumerate(ch_mult):
        plan.append(("level", i, curr))
        if i != len(ch_mult) - 1:
            curr //= 2
    return plan


class CFEncoder(nn.Module):
    """VQ-GAN encoder (codeformer.py:244-299). Returns (latent, captures)
    where captures maps resolution-string → the fuse feature."""

    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    resolution: int = 512
    attn_resolutions: Sequence[int] = (16,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        captures: Dict[str, Array] = {}
        li = 0
        curr = x.shape[1]  # resolution tracked from the actual input
        x = nn.Conv(self.nf, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        for i, mult in enumerate(self.ch_mult):
            out_ch = self.nf * mult
            for j in range(self.num_res_blocks):
                x = CFResBlock(out_ch, self.dtype, name=f"block{li}")(x)
                li += 1
                # capture AFTER the 2nd res block, BEFORE attention
                if j == self.num_res_blocks - 1:
                    captures[str(curr)] = x
                if curr in self.attn_resolutions:
                    x = CFAttnBlock(self.dtype, name=f"attn{li}")(x)
                    li += 1
            if i != len(self.ch_mult) - 1:
                x = CFDownsample(self.dtype, name=f"down{i}")(x)
                curr //= 2
        x = CFResBlock(x.shape[-1], self.dtype, name="mid_block1")(x)
        x = CFAttnBlock(self.dtype, name="mid_attn")(x)
        x = CFResBlock(x.shape[-1], self.dtype, name="mid_block2")(x)
        x = GNorm(name="norm_out")(x)
        x = nn.Conv(self.emb_dim, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        return x, captures


class CFGenerator(nn.Module):
    """VQ-GAN generator (codeformer.py:302-354). ``fuse_fn(res, x)`` is called
    after the first res block of each level (the SFT fusion hook)."""

    nf: int = 64
    emb_dim: int = 256
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    num_res_blocks: int = 2
    resolution: int = 512
    attn_resolutions: Sequence[int] = (16,)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, fuse_fn=None):
        block_in = self.nf * self.ch_mult[-1]
        curr = x.shape[1]  # latent resolution from the actual input
        x = nn.Conv(block_in, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_in")(x)
        x = CFResBlock(block_in, self.dtype, name="mid_block1")(x)
        x = CFAttnBlock(self.dtype, name="mid_attn")(x)
        x = CFResBlock(block_in, self.dtype, name="mid_block2")(x)
        li = 0
        deepest = len(self.ch_mult) - 1
        for i in reversed(range(len(self.ch_mult))):
            out_ch = self.nf * self.ch_mult[i]
            for j in range(self.num_res_blocks):
                x = CFResBlock(out_ch, self.dtype, name=f"block{li}")(x)
                li += 1
                # fuse hooks (codeformer.py:668-676): at the deepest (16×16)
                # level after the LAST res block (before its attention);
                # at every other level after the FIRST res block.
                if fuse_fn is not None:
                    if (i == deepest and j == self.num_res_blocks - 1) or (
                        i != deepest and j == 0
                    ):
                        x = fuse_fn(str(curr), x)
                if curr in self.attn_resolutions:
                    x = CFAttnBlock(self.dtype, name=f"attn{li}")(x)
                    li += 1
            if i != 0:
                x = CFUpsample(self.dtype, name=f"up{i}")(x)
                curr *= 2
        x = GNorm(name="norm_out")(x)
        x = nn.Conv(3, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_out")(x)
        return x


def calc_mean_std(feat, eps=1e-5):
    """Per-channel spatial mean/std of NHWC (codeformer.py:437-452)."""
    mean = feat.mean(axis=(1, 2), keepdims=True)
    var = feat.var(axis=(1, 2), keepdims=True)
    return mean, jnp.sqrt(var + eps)


def adaptive_instance_normalization(content, style):
    """AdaIN: restyle content stats to the style's (codeformer.py:454-470)."""
    s_mean, s_std = calc_mean_std(style)
    c_mean, c_std = calc_mean_std(content)
    return (content - c_mean) / c_std * s_std + s_mean


class TransformerSALayer(nn.Module):
    """Pre-LN self-attention + MLP, query_pos added to q,k
    (codeformer.py:531-571)."""

    embed_dim: int = 512
    nhead: int = 8
    dim_mlp: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, query_pos=None):
        # x: (B, N, C)
        h = nn.LayerNorm(param_dtype=jnp.float32, name="norm1")(x)
        qk = h if query_pos is None else h + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead,
            qkv_features=self.embed_dim,
            out_features=self.embed_dim,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="self_attn",
        )(qk, qk, h)
        x = x + attn
        h = nn.LayerNorm(param_dtype=jnp.float32, name="norm2")(x)
        h = nn.Dense(self.dim_mlp, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.embed_dim, dtype=self.dtype,
                     param_dtype=jnp.float32, name="linear2")(h)
        return x + h


class FuseSFTBlock(nn.Module):
    """SFT skip fusion (codeformer.py:574-597)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, enc_feat, dec_feat, w=1.0):
        h = CFResBlock(self.out_channels, self.dtype, name="encode_enc")(
            jnp.concatenate([enc_feat, dec_feat], axis=-1)
        )

        def mlp(name):
            def f(z):
                z = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"{name}_conv1")(z)
                z = jnp.where(z >= 0, z, 0.2 * z)
                return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                               dtype=self.dtype, param_dtype=jnp.float32,
                               name=f"{name}_conv2")(z)

            return f

        scale = mlp("scale")(h)
        shift = mlp("shift")(h)
        return dec_feat + w * (dec_feat * scale + shift)


@register_model("codeformer")
class CodeFormer(nn.Module):
    """Full CodeFormer (codeformer.py:600-753). NHWC input in [-1, 1] at
    512²; returns (out, logits, lq_feat)."""

    dim_embd: int = 512
    n_head: int = 8
    n_layers: int = 9
    codebook_size: int = 1024
    latent_size: int = 256
    connect_list: Sequence[str] = ("32", "64", "128", "256")
    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, w: float = 0.0, adain: bool = False,
                 code_only: bool = False):
        b = x.shape[0]
        enc = CFEncoder(
            nf=self.nf, ch_mult=self.ch_mult, dtype=self.dtype, name="encoder"
        )
        lq_feat, enc_feats = enc(x)

        # transformer over 16×16 tokens
        tokens = lq_feat.reshape(b, -1, lq_feat.shape[-1])  # (B, 256, 256)
        pos = self.param(
            "position_emb", nn.initializers.zeros,
            (self.latent_size, self.dim_embd), jnp.float32,
        )
        q = nn.Dense(self.dim_embd, dtype=self.dtype,
                     param_dtype=jnp.float32, name="feat_emb")(tokens)
        for i in range(self.n_layers):
            q = TransformerSALayer(
                self.dim_embd, self.n_head, self.dim_embd * 2,
                dtype=self.dtype, name=f"ft_layer{i}",
            )(q, query_pos=pos[None].astype(q.dtype))
        hn = nn.LayerNorm(param_dtype=jnp.float32, name="idx_norm")(q)
        logits = nn.Dense(self.codebook_size, use_bias=False,
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="idx_pred")(hn)  # (B, 256, 1024)
        if code_only:
            return logits, lq_feat

        quant = VectorQuantizer(
            self.codebook_size, lq_feat.shape[-1], name="quantize"
        )
        top_idx = jnp.argmax(logits, axis=-1)  # (B, 256)
        hw = int(math.isqrt(self.latent_size))
        quant_feat = quant.get_codebook_feat(
            top_idx, (b, hw, hw, lq_feat.shape[-1])
        ).astype(lq_feat.dtype)
        quant_feat = jax.lax.stop_gradient(quant_feat)  # detach_16
        if adain:
            quant_feat = adaptive_instance_normalization(quant_feat, lq_feat)

        # channels at each capture resolution: nf·ch_mult[level]
        # (equals the reference's hard-coded map for the 512² config,
        # codeformer.py:649-657)
        resolution = x.shape[1]
        fuse_blocks = {}
        for f in self.connect_list:
            level = int(math.log2(resolution // int(f)))
            fuse_blocks[f] = FuseSFTBlock(
                self.nf * self.ch_mult[level], self.dtype, name=f"fuse_{f}"
            )

        def fuse_fn(res, feat):
            if res in self.connect_list and w > 0:
                return fuse_blocks[res](
                    jax.lax.stop_gradient(enc_feats[res]), feat, w
                )
            return feat

        gen = CFGenerator(
            nf=self.nf, ch_mult=self.ch_mult, dtype=self.dtype, name="generator"
        )
        out = gen(quant_feat, fuse_fn=fuse_fn)
        return out, logits, lq_feat


@register_model("vqautoencoder")
class VQAutoEncoder(nn.Module):
    """Plain VQ-GAN autoencoder (codeformer.py:357-434)."""

    nf: int = 64
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4, 8)
    codebook_size: int = 1024
    emb_dim: int = 256
    quantizer: str = "nearest"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        z, _ = CFEncoder(
            nf=self.nf, ch_mult=self.ch_mult, emb_dim=self.emb_dim,
            dtype=self.dtype, name="encoder",
        )(x)
        if self.quantizer == "nearest":
            z_q, loss, stats = VectorQuantizer(
                self.codebook_size, self.emb_dim, name="quantize"
            )(z)
        else:
            z_q, loss, stats = GumbelQuantizer(
                self.codebook_size, self.emb_dim, name="quantize"
            )(z)
        out = CFGenerator(
            nf=self.nf, ch_mult=self.ch_mult, emb_dim=self.emb_dim,
            dtype=self.dtype, name="generator",
        )(z_q)
        return out, loss, stats
