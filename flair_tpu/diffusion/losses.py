"""VLB losses and the training loss — including a real ``training_losses``,
which the reference *lacks* (respace.py:109-112 wraps a method that does not
exist in gaussian_diffusion.py; see SURVEY.md §0). Ours completes the
capability: MSE / RESCALED_MSE with learned-variance VB term, KL / RESCALED_KL.

Reference parity for the math helpers: guided_diffusion/losses.py:12-77.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian import (
    Diffusion,
    extract,
    p_mean_variance,
    q_posterior_mean_variance,
    q_mean_variance,
    q_sample,
)
from .schedules import LossType, ModelMeanType, ModelVarType

Array = jax.Array


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal gaussians (losses.py:12-39)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Fast tanh approximation of the standard normal CDF (losses.py:42-47)."""
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a gaussian discretized to [-1,1] 8-bit bins
    (losses.py:50-77)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12, None))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12, None))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, 1e-12, None)),
        ),
    )
    return log_probs


def mean_flat(x: Array) -> Array:
    """Mean over all non-batch axes (nn.py:835-839)."""
    return x.reshape(x.shape[0], -1).mean(axis=-1)


def vb_terms_bpd(
    d: Diffusion,
    model_output: Array,
    x_start: Array,
    x_t: Array,
    t: Array,
    clip_denoised: bool = False,
) -> Dict[str, Array]:
    """Variational lower-bound term for one timestep, in bits/dim (the standard
    guided-diffusion ``_vb_terms_bpd``, which the reference inherits from
    upstream but never completes into training_losses)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(d, x_start, x_t, t)
    out = p_mean_variance(d, model_output, x_t, t, clip_denoised=clip_denoised)
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"]
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def training_losses(
    d: Diffusion,
    model_fn: Callable[[Array, Array], Array],
    x_start: Array,
    t: Array,
    rng: Array,
    noise: Optional[Array] = None,
) -> Dict[str, Array]:
    """Compute per-example training losses for a batch of timesteps.

    The reference's TrainLoop calls ``diffusion.training_losses``
    (train_util.py:255-268) but GaussianDiffusion never defines it — this is
    the completed capability. Semantics follow openai/guided-diffusion:

    - MSE / RESCALED_MSE: MSE on the mean-type target; when variance is
      learned, add a VB term with the mean frozen (stop_gradient) and, for
      RESCALED_MSE, scale it by T/1000.
    - KL / RESCALED_KL: pure VLB.
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
    x_t = q_sample(d, x_start, t, noise)
    terms: Dict[str, Array] = {}

    model_output = model_fn(x_t, t)

    if d.loss_type in (LossType.KL, LossType.RESCALED_KL):
        vb = vb_terms_bpd(d, model_output, x_start, x_t, t, clip_denoised=False)
        terms["loss"] = vb["output"]
        if d.loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * d.num_timesteps
    elif d.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
        C = x_start.shape[-1]
        if d.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            assert model_output.shape[-1] == 2 * C
            eps_part, var_part = jnp.split(model_output, 2, axis=-1)
            # VB with frozen mean so it only trains the variance head.
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(eps_part), var_part], axis=-1
            )
            vb = vb_terms_bpd(d, frozen_out, x_start, x_t, t, clip_denoised=False)
            terms["vb"] = vb["output"]
            if d.loss_type == LossType.RESCALED_MSE:
                terms["vb"] = terms["vb"] * (d.num_timesteps / 1000.0)
            model_output = eps_part
        target = {
            ModelMeanType.PREVIOUS_X: q_posterior_mean_variance(d, x_start, x_t, t)[0],
            ModelMeanType.START_X: x_start,
            ModelMeanType.EPSILON: noise,
        }[d.model_mean_type]
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
    else:
        raise NotImplementedError(d.loss_type)
    return terms


def prior_bpd(d: Diffusion, x_start: Array) -> Array:
    """KL(q(x_T|x_0) || N(0,1)) in bits/dim."""
    t = jnp.full((x_start.shape[0],), d.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_variance = q_mean_variance(d, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
    return mean_flat(kl_prior) / np.log(2.0)
