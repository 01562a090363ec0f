"""Timestep samplers for training: uniform and loss-second-moment importance
sampling (reference: guided_diffusion/resample.py:8-154).

The reference syncs per-rank losses with ``torch.distributed.all_gather``
(resample.py:83-104); here the history update takes the *already-gathered*
(t, loss) batch — inside a pjit'd train step use ``jax.lax.all_gather`` on the
data axis, or on host just pass the global batch. The sampler state is a pure
pytree so it can be carried functionally.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def uniform_sample(rng: Array, batch: int, num_timesteps: int) -> Tuple[Array, Array]:
    """UniformSampler.sample (resample.py:23-62): t ~ U[0,T), weights = 1."""
    t = jax.random.randint(rng, (batch,), 0, num_timesteps)
    weights = jnp.ones((batch,), jnp.float32)
    return t, weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LossAwareState:
    """History ring-buffer of per-timestep losses (resample.py:108-154)."""

    loss_history: Array  # (T, history_per_term) f32
    loss_counts: Array   # (T,) int32

    @staticmethod
    def create(num_timesteps: int, history_per_term: int = 10) -> "LossAwareState":
        return LossAwareState(
            loss_history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
        )


def loss_aware_weights(
    state: LossAwareState, uniform_prob: float = 0.001
) -> Array:
    """Sampling probabilities ∝ sqrt(E[loss²]) once warmed up
    (resample.py:126-140)."""
    history_per_term = state.loss_history.shape[1]
    warmed = jnp.all(state.loss_counts == history_per_term)
    weights = jnp.sqrt(jnp.mean(state.loss_history**2, axis=-1))
    weights = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    weights = weights * (1 - uniform_prob) + uniform_prob / weights.shape[0]
    T = state.loss_history.shape[0]
    uniform = jnp.full((T,), 1.0 / T, jnp.float32)
    return jnp.where(warmed, weights, uniform)


def loss_aware_sample(
    rng: Array, state: LossAwareState, batch: int
) -> Tuple[Array, Array]:
    """Sample t with importance weights 1/(T·p[t]) (resample.py:44-62)."""
    p = loss_aware_weights(state)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * jnp.take(p, t))
    return t, weights.astype(jnp.float32)


def update_with_losses(
    state: LossAwareState, ts: Array, losses: Array
) -> LossAwareState:
    """Insert the batch's (t, loss) pairs into the ring buffer
    (resample.py:142-154). Vectorized scatter; ties within one batch resolve
    arbitrarily but the buffer converges identically in expectation."""
    history_per_term = state.loss_history.shape[1]

    def body(carry, tl):
        hist, counts = carry
        t, loss = tl
        count = counts[t]
        at_cap = count == history_per_term
        # full: shift left and append; else write at `count`
        row = hist[t]
        shifted = jnp.concatenate([row[1:], jnp.array([loss])])
        written = jax.lax.dynamic_update_index_in_dim(
            row, loss, jnp.minimum(count, history_per_term - 1), axis=0
        )
        new_row = jnp.where(at_cap, shifted, written)
        hist = hist.at[t].set(new_row)
        counts = counts.at[t].set(jnp.minimum(count + 1, history_per_term))
        return (hist, counts), None

    (hist, counts), _ = jax.lax.scan(
        body, (state.loss_history, state.loss_counts), (ts, losses)
    )
    return LossAwareState(loss_history=hist, loss_counts=counts)
