"""Denoiser wrappers: spaced-step → model-conditioning mapping.

Equivalent of respace._WrappedModel (respace.py:138-167): the sampler hands
the *spaced* step index t; the BlurUNet receives the original-schedule
integer index, the BicubicUNet receives the continuous noise level
``sqrt_alphas_cumprod_prev[t+1]`` (respace.py:161-165).

Both wrappers accept an optional precomputed ``flows`` dict: SPyNet flows
depend only on ``rnn_input``, which is constant across a window's 100
sampler steps, so ``make_flows_fn`` computes them ONCE per window and the
per-step apply skips the flow network entirely (the reference recomputes
identical flows inside every denoiser evaluation, unet.py:531-595 /
unet_new.py:1283-1348).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion import Diffusion, map_timesteps, scale_timesteps, sr3_noise_level

Array = jax.Array


def make_flows_fn(model, params) -> Callable:
    """(rnn_input,) → {res: (fwd, bwd)} under the model's param scope."""

    def flows(rnn_input):
        return model.apply(
            params,
            rnn_input,
            jnp.zeros(rnn_input.shape[:2], jnp.float32),
            rnn_input,
            rnn_input=rnn_input,
            compute_flows_only=True,
        )

    return flows


def wrap_bicubic_model(
    d: Diffusion, model, params, *, enable_cross_frames: bool = True
) -> Callable:
    """(x, t, low_res, rnn_input, vsrpp_weights[, flows]) → eps (SR3 UNet).

    The returned callable also carries:
    - ``.apply_p(params, x, t, low_res, rnn_input, vsrpp_weights, flows)`` —
      the same computation with params (and everything else) as runtime
      arguments, for the two-program sampler: jit THIS so per-window data
      stays out of the traced program's constants;
    - ``.params`` — the bound parameter tree;
    - ``.flows_fn(rnn_input)`` — the once-per-window SPyNet flow precompute.
    """

    def apply_p(params, x, t, low_res, rnn_input, vsrpp_weights, flows=None):
        b, tw = x.shape[0], x.shape[1]
        lvl = jnp.full((b, tw), sr3_noise_level(d, t), jnp.float32)
        return model.apply(
            params,
            x,
            lvl,
            low_res,
            rnn_input=rnn_input,
            enable_cross_frames=enable_cross_frames,
            vsrpp_weights=vsrpp_weights,
            flows=flows,
        )

    def apply(x, t, low_res, rnn_input, vsrpp_weights, flows=None):
        return apply_p(params, x, t, low_res, rnn_input, vsrpp_weights, flows)

    apply.apply_p = apply_p
    apply.params = params
    apply.flows_fn = make_flows_fn(model, params)
    return apply


def wrap_blur_model(
    d: Diffusion, model, params, *, enable_cross_frames: bool = True
) -> Callable:
    """(x, t, low_res, rnn_input, vsrpp_weights[, flows]) → (eps, var).

    Carries ``.apply_p`` / ``.params`` / ``.flows_fn`` like
    :func:`wrap_bicubic_model`.
    """

    def apply_p(params, x, t, low_res, rnn_input, vsrpp_weights, flows=None):
        b, tw = x.shape[0], x.shape[1]
        t_orig = scale_timesteps(d, map_timesteps(d, t))
        ts = jnp.full((b, tw), t_orig, jnp.int32)
        return model.apply(
            params,
            x,
            ts,
            low_res,
            rnn_input=rnn_input,
            enable_cross_frames=enable_cross_frames,
            vsrpp_weights=vsrpp_weights,
            flows=flows,
        )

    def apply(x, t, low_res, rnn_input, vsrpp_weights, flows=None):
        return apply_p(params, x, t, low_res, rnn_input, vsrpp_weights, flows)

    apply.apply_p = apply_p
    apply.params = params
    apply.flows_fn = make_flows_fn(model, params)
    return apply
