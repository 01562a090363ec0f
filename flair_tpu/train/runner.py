"""Host training run loop: data iteration, AMT skip-frame interpolation,
quartile logging, orbax save/resume with EMA streams.

Re-design of the reference TrainLoop host side (train_util.py:183-334):
- ``run_loop`` drives next(data) → jitted train step, honours
  ``DIFFUSION_TRAINING_TEST`` (train_util.py:199-200 CI escape hatch);
- when ``skip > 1`` the low-res conditioning of temporally-decimated clips
  is densified with AMT frame interpolation before the step
  (train_util.py:231-250 roundrobin merge);
- losses are logged as means AND per-timestep-quartile means
  (train_util.py:359-365 log_loss_dict);
- checkpoints: one orbax dir per save holding params/opt/EMA streams plus a
  step marker, resume parses the step back (train_util.py:296-334; the
  chunked-broadcast weight distribution of dist_util.py:40-68 is replaced by
  replicated device_put at load).
"""

from __future__ import annotations

import os
import re
from typing import Any, Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logging as logger
from ..utils.checkpoint import load_pytree, save_pytree
from .loop import TrainConfig, TrainState, create_train_state, make_train_step

Array = jax.Array


def interpolate_skipped_frames(amt_model, amt_params, low_res: Array,
                               skip: int) -> Array:
    """Densify (B, N, H, W, 3) conditioning with AMT: between each adjacent
    pair insert ``skip - 1`` interpolated frames, roundrobin-merged
    (train_util.py:231-250). Frames in [-1, 1]."""
    from ..models.amt import interpolate

    b, n = low_res.shape[0], low_res.shape[1]
    f0 = low_res[:, :-1].reshape((b * (n - 1),) + low_res.shape[2:])
    f1 = low_res[:, 1:].reshape((b * (n - 1),) + low_res.shape[2:])
    mid = interpolate(amt_model, amt_params, f0, f1, skip)
    mid = mid.reshape((b, n - 1) + mid.shape[1:])  # (B, N-1, skip-1, H, W, 3)
    # roundrobin: f_0, mid_0.., f_1, mid_1.., ..., f_{N-1}
    pieces = []
    for i in range(n - 1):
        pieces.append(low_res[:, i : i + 1])
        pieces.append(mid[:, i])
    pieces.append(low_res[:, n - 1 :])
    return jnp.concatenate(pieces, axis=1)


def log_loss_quartiles(num_timesteps: int, t: np.ndarray,
                       loss_each: np.ndarray, key: str = "loss") -> None:
    """logkv_mean of the loss and its per-timestep-quartile buckets
    (train_util.py:359-365)."""
    logger.logkv_mean(key, float(loss_each.mean()))
    for ti, li in zip(np.asarray(t).ravel(), np.asarray(loss_each).ravel()):
        quartile = int(4 * int(ti) / num_timesteps)
        logger.logkv_mean(f"{key}_q{quartile}", float(li))


def find_resume_checkpoint(ckpt_dir: str) -> tuple[Optional[str], int]:
    """Latest ``state_{step:06d}`` dir and its step (train_util.py:322-334
    filename-parse semantics)."""
    if not os.path.isdir(ckpt_dir):
        return None, 0
    best = (None, 0)
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"state_(\d{6,})", name)
        if m and int(m.group(1)) >= best[1]:
            best = (os.path.join(ckpt_dir, name), int(m.group(1)))
    return best


class TrainRunner:
    """Host loop around the jitted train step.

    ``data``: iterator yielding batch dicts with at least ``x_start``
    (B, T, H, W, C) in [-1, 1] (host or device arrays).
    """

    def __init__(
        self,
        diffusion,
        apply_fn: Callable,
        cfg: TrainConfig,
        params,
        *,
        ckpt_dir: str = "./checkpoints_out",
        log_interval: int = 10,
        save_interval: int = 10000,
        skip: int = 1,
        amt: Optional[tuple] = None,  # (model, params) when skip > 1
        mesh=None,
        rng: Optional[Array] = None,
    ):
        self.d = diffusion
        self.cfg = cfg
        self.ckpt_dir = ckpt_dir
        self.log_interval = log_interval
        self.save_interval = save_interval
        self.skip = skip
        self.amt = amt
        self.mesh = mesh
        self.rng = jax.random.PRNGKey(0) if rng is None else rng

        resume_path, self.resume_step = find_resume_checkpoint(ckpt_dir)
        self.state = create_train_state(params, cfg)
        if resume_path is not None:
            logger.log(f"resuming from {resume_path} (step {self.resume_step})")
            restored = load_pytree(
                resume_path, target=jax.tree_util.tree_map(np.asarray, self.state)
            )
            self.state = jax.tree_util.tree_map(jnp.asarray, restored)

        step_fn = make_train_step(diffusion, apply_fn, cfg)
        self.train_step = jax.jit(step_fn)
        self.step = 0

    def _prepare(self, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.skip > 1 and "low_res_input" in batch:
            if self.amt is None:
                raise ValueError("skip > 1 requires an (AMT model, params) pair")
            batch["low_res_input"] = interpolate_skipped_frames(
                self.amt[0], self.amt[1], batch["low_res_input"], self.skip
            )
        return batch

    def run_step(self, batch) -> dict:
        batch = self._prepare(batch)
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self.train_step(self.state, batch, k)
        host = {k2: np.asarray(v) for k2, v in metrics.items()}
        log_loss_quartiles(self.d.num_timesteps, host["t"], host["loss_each"])
        logger.logkv("step", self.step + self.resume_step)
        logger.logkv_mean("grad_norm", float(host["grad_norm"]))
        logger.logkv_mean("param_norm", float(host["param_norm"]))
        self.step += 1
        return host

    def save(self) -> str:
        step = self.step + self.resume_step
        path = os.path.join(self.ckpt_dir, f"state_{step:06d}")
        logger.log(f"saving model at step {step}...")
        save_pytree(path, jax.tree_util.tree_map(np.asarray, self.state))
        return path

    def run_loop(self, data: Iterator[dict], max_steps: int = 0) -> None:
        """Train until lr_anneal_steps / max_steps; save on cadence
        (train_util.py:183-207)."""
        while True:
            total = self.step + self.resume_step
            if self.cfg.lr_anneal_steps and total >= self.cfg.lr_anneal_steps:
                break
            if max_steps and self.step >= max_steps:
                break
            self.run_step(next(data))
            if self.step % self.log_interval == 0:
                logger.dumpkvs()
            if self.step % self.save_interval == 0 and self.step != 0:
                self.save()
                if os.environ.get("DIFFUSION_TRAINING_TEST", ""):
                    return
        if (self.step - 1) % self.save_interval != 0:
            self.save()
