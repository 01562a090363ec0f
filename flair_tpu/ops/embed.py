"""Timestep / noise-level embeddings (nn.py:863-881, sr3.py:45-61)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def timestep_embedding(timesteps: Array, dim: int, max_period: int = 10000) -> Array:
    """ADM sinusoidal embedding: cat([cos, sin]) of geometric frequencies
    (nn.py:863-881). ``timesteps`` (N,) possibly fractional → (N, dim)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def sr3_noise_embedding(noise_level: Array, dim: int) -> Array:
    """WaveGrad/SR3 continuous-noise-level encoding: cat([sin, cos]) of
    noise_level * exp(-ln(1e4) * k/half) (sr3.py:45-61). Note the sin/cos
    order differs from the ADM embedding."""
    count = dim // 2
    step = jnp.arange(count, dtype=jnp.float32) / count
    enc = noise_level.astype(jnp.float32)[:, None] * jnp.exp(
        -math.log(1e4) * step[None]
    )
    return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)
