"""Denoiser wrappers: spaced-step → model-conditioning mapping.

Equivalent of respace._WrappedModel (respace.py:138-167): the sampler hands
the *spaced* step index t; the BlurUNet receives the original-schedule
integer index, the BicubicUNet receives the continuous noise level
``sqrt_alphas_cumprod_prev[t+1]`` (respace.py:161-165).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..diffusion import Diffusion, map_timesteps, scale_timesteps, sr3_noise_level

Array = jax.Array


def wrap_bicubic_model(
    d: Diffusion, model, params, *, enable_cross_frames: bool = True
) -> Callable:
    """(x, t, low_res, rnn_input, vsrpp_weights) → eps, for the SR3 UNet."""

    def apply(x, t, low_res, rnn_input, vsrpp_weights):
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
        )

    return apply


def wrap_blur_model(
    d: Diffusion, model, params, *, enable_cross_frames: bool = True
) -> Callable:
    """(x, t, low_res, rnn_input, vsrpp_weights) → (eps, var), for BlurUNet."""

    def apply(x, t, low_res, rnn_input, vsrpp_weights):
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
        )

    return apply
