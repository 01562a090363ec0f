"""Gaussian diffusion core: q/p distributions and eps↔x0 conversions in pure jnp.

Functional re-design of the reference ``GaussianDiffusion``
(guided_diffusion/gaussian_diffusion.py:95-370). The ``Diffusion`` container is
a registered pytree so it can flow through ``jax.jit`` / ``lax.scan``; all
tables are f32 device constants derived on host in f64 (schedules.compute_tables).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import (
    LossType,
    ModelMeanType,
    ModelVarType,
    ScheduleTables,
    compute_tables,
    respace_betas,
    space_timesteps,
)

Array = jax.Array

_TABLE_FIELDS = (
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "sqrt_alphas_cumprod",
    "sqrt_alphas_cumprod_prev",
    "sqrt_one_minus_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod_prev",
    "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
    "log_betas",
    "timestep_map",
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Diffusion:
    """Per-timestep tables (f32, possibly respaced) plus static config.

    ``timestep_map`` maps spaced indices → original indices (respace.py:90-101);
    for an un-respaced process it is arange(T). ``original_num_steps`` is the
    length of the base schedule (needed for timestep rescaling).
    """

    # data fields (pytree leaves)
    betas: Array
    alphas_cumprod: Array
    alphas_cumprod_prev: Array
    sqrt_alphas_cumprod: Array
    sqrt_alphas_cumprod_prev: Array  # length T+1
    sqrt_one_minus_alphas_cumprod: Array
    sqrt_one_minus_alphas_cumprod_prev: Array
    log_one_minus_alphas_cumprod: Array
    sqrt_recip_alphas_cumprod: Array
    sqrt_recipm1_alphas_cumprod: Array
    posterior_variance: Array
    posterior_log_variance_clipped: Array
    posterior_mean_coef1: Array
    posterior_mean_coef2: Array
    log_betas: Array
    timestep_map: Array  # int32, length T
    # static (aux) fields
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    original_num_steps: int = dataclasses.field(metadata=dict(static=True))
    model_mean_type: ModelMeanType = dataclasses.field(metadata=dict(static=True))
    model_var_type: ModelVarType = dataclasses.field(metadata=dict(static=True))
    loss_type: LossType = dataclasses.field(metadata=dict(static=True))
    rescale_timesteps: bool = dataclasses.field(metadata=dict(static=True))


def make_diffusion(
    betas: np.ndarray,
    *,
    model_mean_type: ModelMeanType = ModelMeanType.EPSILON,
    model_var_type: ModelVarType = ModelVarType.FIXED_SMALL,
    loss_type: LossType = LossType.MSE,
    rescale_timesteps: bool = False,
    use_timesteps=None,
    dtype=jnp.float32,
) -> Diffusion:
    """Build a (possibly respaced) Diffusion from a base f64 beta schedule.

    Equivalent to GaussianDiffusion.__init__ (gaussian_diffusion.py:112-173)
    composed with SpacedDiffusion.__init__ (respace.py:87-102).
    """
    betas = np.asarray(betas, dtype=np.float64)
    original_num_steps = len(betas)
    if use_timesteps is not None:
        betas, timestep_map = respace_betas(betas, use_timesteps)
    else:
        timestep_map = np.arange(len(betas), dtype=np.int32)
    t: ScheduleTables = compute_tables(betas)
    to_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return Diffusion(
        betas=to_dev(t.betas),
        alphas_cumprod=to_dev(t.alphas_cumprod),
        alphas_cumprod_prev=to_dev(t.alphas_cumprod_prev),
        sqrt_alphas_cumprod=to_dev(t.sqrt_alphas_cumprod),
        sqrt_alphas_cumprod_prev=to_dev(t.sqrt_alphas_cumprod_prev),
        sqrt_one_minus_alphas_cumprod=to_dev(t.sqrt_one_minus_alphas_cumprod),
        sqrt_one_minus_alphas_cumprod_prev=to_dev(t.sqrt_one_minus_alphas_cumprod_prev),
        log_one_minus_alphas_cumprod=to_dev(t.log_one_minus_alphas_cumprod),
        sqrt_recip_alphas_cumprod=to_dev(t.sqrt_recip_alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=to_dev(t.sqrt_recipm1_alphas_cumprod),
        posterior_variance=to_dev(t.posterior_variance),
        posterior_log_variance_clipped=to_dev(t.posterior_log_variance_clipped),
        posterior_mean_coef1=to_dev(t.posterior_mean_coef1),
        posterior_mean_coef2=to_dev(t.posterior_mean_coef2),
        log_betas=to_dev(t.log_betas),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        num_timesteps=t.num_timesteps,
        original_num_steps=original_num_steps,
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )


def make_task_diffusion(task: str, steps: str = "100") -> Diffusion:
    """Per-task SpacedDiffusion factory matching the demo CLI
    (scripts/video_sample.py:35-68, 311-325)."""
    from .schedules import get_named_beta_schedule

    cfg = {
        "x8_bicubic": ("face_bicubic", 2000, ModelVarType.FIXED_SMALL, LossType.MSE),
        "x16_bicubic": ("face_bicubic", 2000, ModelVarType.FIXED_SMALL, LossType.MSE),
        "gaussian": ("face_blur", 1000, ModelVarType.LEARNED_RANGE, LossType.RESCALED_MSE),
        "jpeg": ("face_blur", 1000, ModelVarType.LEARNED_RANGE, LossType.RESCALED_MSE),
    }[task]
    schedule_name, diffusion_steps, var_type, loss_type = cfg
    betas = get_named_beta_schedule(schedule_name, diffusion_steps)
    return make_diffusion(
        betas,
        model_mean_type=ModelMeanType.EPSILON,
        model_var_type=var_type,
        loss_type=loss_type,
        rescale_timesteps=False,
        use_timesteps=space_timesteps(diffusion_steps, steps, "uniform"),
    )


def extract(arr: Array, t: Array, ndim: int) -> Array:
    """Gather per-timestep scalars and reshape for broadcast against an
    ndim-dimensional batch tensor (gaussian_diffusion.py:692-705)."""
    out = jnp.take(arr, t, axis=0).astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def q_mean_variance(d: Diffusion, x_start: Array, t: Array):
    """q(x_t | x_0) moments (gaussian_diffusion.py:189-204)."""
    nd = x_start.ndim
    mean = extract(d.sqrt_alphas_cumprod, t, nd) * x_start
    variance = extract(1.0 - d.alphas_cumprod, t, nd)
    log_variance = extract(d.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(d: Diffusion, x_start: Array, t: Array, noise: Array) -> Array:
    """Sample q(x_t | x_0) (gaussian_diffusion.py:206-224)."""
    nd = x_start.ndim
    return (
        extract(d.sqrt_alphas_cumprod, t, nd) * x_start
        + extract(d.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def q_posterior_mean_variance(d: Diffusion, x_start: Array, x_t: Array, t: Array):
    """q(x_{t-1} | x_t, x_0) moments (gaussian_diffusion.py:226-248)."""
    nd = x_t.ndim
    posterior_mean = (
        extract(d.posterior_mean_coef1, t, nd) * x_start
        + extract(d.posterior_mean_coef2, t, nd) * x_t
    )
    posterior_variance = extract(d.posterior_variance, t, nd)
    posterior_log_variance = extract(d.posterior_log_variance_clipped, t, nd)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(d: Diffusion, x_t: Array, t: Array, eps: Array) -> Array:
    """(gaussian_diffusion.py:344-349)"""
    nd = x_t.ndim
    return (
        extract(d.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(d.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(d: Diffusion, x_t: Array, t: Array, pred_xstart: Array) -> Array:
    """(gaussian_diffusion.py:361-365)"""
    nd = x_t.ndim
    return (
        extract(d.sqrt_recip_alphas_cumprod, t, nd) * x_t - pred_xstart
    ) / extract(d.sqrt_recipm1_alphas_cumprod, t, nd)


def scale_timesteps(d: Diffusion, t: Array) -> Array:
    """Optional 0..1000 rescaling (gaussian_diffusion.py:367-370, respace.py:158-159).

    Applied to *original* (mapped) indices for a respaced process."""
    if d.rescale_timesteps:
        return t.astype(jnp.float32) * (1000.0 / d.original_num_steps)
    return t


def sr3_noise_level(d: Diffusion, t: Array) -> Array:
    """Continuous noise-level conditioning for the SR3 UNet: the respaced
    ``sqrt_alphas_cumprod_prev[t + 1]`` (respace.py:161-165)."""
    return jnp.take(d.sqrt_alphas_cumprod_prev, t + 1, axis=0).astype(jnp.float32)


def map_timesteps(d: Diffusion, t: Array) -> Array:
    """Spaced index → original schedule index (respace.py:155-157)."""
    return jnp.take(d.timestep_map, t, axis=0)


# ---------------------------------------------------------------------------
# p_mean_variance: turn a raw model output into (mean, variance, pred_xstart).
# ---------------------------------------------------------------------------


def p_mean_variance(
    d: Diffusion,
    model_output: Array,
    x: Array,
    t: Array,
    clip_denoised: bool = True,
):
    """Reverse-step moments from a raw denoiser output
    (gaussian_diffusion.py:250-342). ``model_output`` carries 2*C channels on
    the channel axis (last axis, NHWC convention) for LEARNED/LEARNED_RANGE.

    Returns dict(mean, variance, log_variance, pred_xstart).
    """
    nd = x.ndim
    C = x.shape[-1]
    if d.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        assert model_output.shape[-1] == 2 * C, model_output.shape
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        if d.model_var_type == ModelVarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = extract(d.posterior_log_variance_clipped, t, nd)
            max_log = extract(d.log_betas, t, nd)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    else:
        if model_output.shape[-1] == 2 * C:
            model_output = model_output[..., :C]
        if d.model_var_type == ModelVarType.FIXED_LARGE:
            # variance = append(posterior_variance[1], betas[1:])
            var_table = jnp.concatenate([d.posterior_variance[1:2], d.betas[1:]])
            model_variance = extract(var_table, t, nd)
            model_log_variance = jnp.log(model_variance)
        elif d.model_var_type == ModelVarType.FIXED_SMALL:
            model_variance = extract(d.posterior_variance, t, nd)
            model_log_variance = extract(d.posterior_log_variance_clipped, t, nd)
        else:
            raise NotImplementedError(d.model_var_type)

    def process_xstart(x0):
        return jnp.clip(x0, -1, 1) if clip_denoised else x0

    if d.model_mean_type == ModelMeanType.PREVIOUS_X:
        nd_ = x.ndim
        coef1 = extract(1.0 / d.posterior_mean_coef1, t, nd_)
        coef2 = extract(d.posterior_mean_coef2 / d.posterior_mean_coef1, t, nd_)
        pred_xstart = process_xstart(coef1 * model_output - coef2 * x)
        model_mean = model_output
    elif d.model_mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
        if d.model_mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(predict_xstart_from_eps(d, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(d, pred_xstart, x, t)
    else:
        raise NotImplementedError(d.model_mean_type)
    return dict(
        mean=model_mean,
        variance=model_variance,
        log_variance=model_log_variance,
        pred_xstart=pred_xstart,
    )
