"""Denoiser UNets, temporal stack, face nets, interpolators (flax.linen).

Layout: channels-last. Videos are (B, T, H, W, C); per-frame modules vmap or
reshape over T explicitly (replacing the reference's LazyReshaper2D/3D,
nn.py:350-367). bf16 trunk + f32 norms is a dtype policy on each module.
"""

from .registry import get_model, register_model, list_models
