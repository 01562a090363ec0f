"""Config registry: dataclass presets + argparse bridge.

Replaces the reference's two disjoint flag systems (SURVEY.md §5.6):
(a) demo CLI dicts (scripts/video_sample.py:33-171) — now frozen dataclasses
in flair_tpu.pipeline.video.TASK_CONFIGS; (b) training-side ``*_defaults()``
dicts flattened into argparse (script_util.py:14-62,285-310) — mirrored here,
including ``create_model_and_diffusion`` (script_util.py:65-282).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Any, Dict, Sequence


def model_and_diffusion_defaults() -> Dict[str, Any]:
    """Flag defaults (script_util.py:14-62)."""
    return dict(
        task="gaussian",
        image_size=512,
        num_channels=128,
        num_res_blocks=2,
        num_heads=1,
        num_head_channels=64,
        attention_resolutions="16,32,64",
        rnn_resolutions="1,2",
        channel_mult="0.5,1,1,2,2,4,4",
        dropout=0.0,
        learn_sigma=True,
        diffusion_steps=1000,
        noise_schedule="face_blur",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
        use_scale_shift_norm=True,
        resblock_updown=True,
        use_fp16=True,
        temporal_block=True,
    )


def create_model_and_diffusion(**kwargs):
    """Factory (script_util.py:65-282): builds the task's denoiser module and
    the (respaced) Diffusion."""
    import jax.numpy as jnp

    from ..diffusion import make_diffusion
    from ..diffusion.schedules import (
        LossType,
        ModelMeanType,
        ModelVarType,
        get_named_beta_schedule,
        space_timesteps,
    )
    from ..models.registry import get_model

    cfg = model_and_diffusion_defaults()
    cfg.update(kwargs)

    task = cfg["task"]
    dtype = jnp.bfloat16 if cfg["use_fp16"] else jnp.float32
    if task in ("x8_bicubic", "x16_bicubic"):
        model = get_model(
            "bicubic_unet",
            image_size=cfg["image_size"],
            dtype=dtype,
        )
        learn_sigma = False
        schedule = "face_bicubic"
        steps = 2000
    else:
        model = get_model(
            "blur_unet",
            image_size=cfg["image_size"],
            model_channels=cfg["num_channels"],
            num_res_blocks=cfg["num_res_blocks"],
            attention_resolutions=tuple(
                int(s) for s in str(cfg["attention_resolutions"]).split(",")
            ),
            rnn_resolutions=tuple(
                int(s) for s in str(cfg["rnn_resolutions"]).split(",")
            ),
            channel_mult=tuple(
                float(s) for s in str(cfg["channel_mult"]).split(",")
            ),
            num_head_channels=cfg["num_head_channels"],
            use_scale_shift_norm=cfg["use_scale_shift_norm"],
            resblock_updown=cfg["resblock_updown"],
            temporal_block=cfg["temporal_block"],
            out_channels=6 if cfg["learn_sigma"] else 3,
            dtype=dtype,
        )
        learn_sigma = cfg["learn_sigma"]
        schedule = cfg["noise_schedule"]
        steps = cfg["diffusion_steps"]

    betas = get_named_beta_schedule(schedule, steps)
    if cfg["use_kl"]:
        loss_type = LossType.RESCALED_KL
    elif cfg["rescale_learned_sigmas"]:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    use_timesteps = None
    if cfg["timestep_respacing"]:
        use_timesteps = space_timesteps(len(betas), cfg["timestep_respacing"])
    diffusion = make_diffusion(
        betas,
        model_mean_type=(
            ModelMeanType.START_X if cfg["predict_xstart"] else ModelMeanType.EPSILON
        ),
        model_var_type=(
            ModelVarType.LEARNED_RANGE if learn_sigma else ModelVarType.FIXED_SMALL
        ),
        loss_type=loss_type,
        rescale_timesteps=cfg["rescale_timesteps"],
        use_timesteps=use_timesteps,
    )
    return model, diffusion


def add_dict_to_argparser(parser: argparse.ArgumentParser, default_dict):
    """(script_util.py:285-296)."""
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys):
    return {k: getattr(args, k) for k in keys}


def str2bool(v):
    """(script_util.py:299-310)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")
