"""Functional training step + host loop.

Re-design of train_util.py:37-365 / fp16_util.py:149-243:
- manual fp16 master-param flattening + dynamic loss scaling → bf16 compute
  with f32 params (no loss scaling needed on TPU; fp16_util.py disappears);
- DDP + no_sync microbatching (train_util.py:125-132,255-278) → microbatch
  lax.scan inside ONE jitted step; GSPMD inserts a single gradient psum;
- EMA per rate (train_util.py:280-282) → extra param pytrees (ops.ema);
- checkpoint save/resume (train_util.py:296-334) → utils.checkpoint (orbax).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion import Diffusion, training_losses
from ..diffusion.resample import uniform_sample
from ..ops.ema import ema_update

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Flags mirrored from the reference argparse surface
    (script_util.py:14-62, train_util.py:37-99)."""

    lr: float = 1e-4
    weight_decay: float = 0.0
    ema_rates: Sequence[float] = (0.9999,)
    microbatch: int = -1          # frames per microbatch step; -1 = whole batch
    grad_clip: float = 0.0
    lr_anneal_steps: int = 0


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    ema_params: Any  # tuple of pytrees, one per ema rate


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    txs = []
    if cfg.grad_clip > 0:
        txs.append(optax.clip_by_global_norm(cfg.grad_clip))
    if cfg.lr_anneal_steps > 0:
        sched = optax.linear_schedule(cfg.lr, 0.0, cfg.lr_anneal_steps)
    else:
        sched = cfg.lr
    txs.append(optax.adamw(sched, weight_decay=cfg.weight_decay))
    return optax.chain(*txs)


def create_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=tuple(
            jax.tree_util.tree_map(lambda x: x.astype(jnp.float32), params)
            for _ in cfg.ema_rates
        ),
    )


def make_train_step(
    d: Diffusion,
    apply_fn: Callable,  # (params, x_t, t, batch_extras) -> model output
    cfg: TrainConfig,
):
    """Build the jitted train step.

    ``batch`` is a dict with at least ``x_start`` (B, T, H, W, C); extra keys
    (low_res_input, rnn_input, ...) are passed to ``apply_fn``. Timesteps are
    sampled uniformly and shared across frames of a clip, as the reference
    repeats t per frame (train_util.py:252-253).
    """
    tx = make_optimizer(cfg)

    def loss_fn(params, batch, t, rng):
        x = batch["x_start"]
        b, tw = x.shape[0], x.shape[1]

        def model_fn(x_t, t_b):
            ts = jnp.repeat(t_b[:, None], tw, axis=1)
            return apply_fn(params, x_t, ts, batch)

        terms = training_losses(d, model_fn, x, t, rng)
        return terms["loss"].mean(), terms

    def one_micro(params, micro, t, rng):
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, micro, t, rng
        )
        return loss, terms, grads

    def train_step(state: TrainState, batch, rng):
        b = batch["x_start"].shape[0]
        rng, t_rng = jax.random.split(rng)
        t, _ = uniform_sample(t_rng, b, d.num_timesteps)

        if cfg.microbatch in (-1, 0) or cfg.microbatch >= b:
            loss, terms, grads = one_micro(state.params, batch, t, rng)
            loss_each = terms["loss"]
        else:
            # microbatch accumulation as a scan: one psum at the end, the
            # TPU equivalent of DDP no_sync (train_util.py:255-278)
            mb = cfg.microbatch
            n_micro = b // mb

            def resh(x):
                return x.reshape((n_micro, mb) + x.shape[1:])

            micro_batches = jax.tree_util.tree_map(resh, batch)
            t_m = t.reshape(n_micro, mb)
            rngs = jax.random.split(rng, n_micro)

            def scan_body(acc, xs):
                micro, t_i, r_i = xs
                loss, terms, grads = one_micro(state.params, micro, t_i, r_i)
                acc_loss, acc_grads = acc
                return (
                    acc_loss + loss / n_micro,
                    jax.tree_util.tree_map(
                        lambda a, g: a + g / n_micro, acc_grads, grads
                    ),
                ), terms["loss"]

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), loss_each = jax.lax.scan(
                scan_body, (0.0, zero_grads), (micro_batches, t_m, rngs)
            )
            loss_each = loss_each.reshape(b)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = tuple(
            ema_update(e, new_params, rate)
            for e, rate in zip(state.ema_params, cfg.ema_rates)
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "param_norm": optax.global_norm(new_params),
            # per-sample loss + timestep for quartile logging
            # (train_util.py:359-365)
            "loss_each": loss_each,
            "t": t,
        }
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step
