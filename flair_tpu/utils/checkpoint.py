"""Checkpoint save/load: orbax for native pytrees, converters for torch.

Reference behaviour being replaced (SURVEY.md §5.4):
- training save/resume of model/EMA/opt streams (train_util.py:296-334,
  dist_util.py:40-68 chunked broadcast) → orbax checkpoints + replicated
  device_put at load;
- inference ``torch.load`` state dicts (video_sample.py:330,358) → a
  name-mapped torch→flax converter (torch tensors are read with torch CPU,
  transposed to NHWC/HWIO layouts).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Native (orbax / npz) checkpoints
# ---------------------------------------------------------------------------


def save_pytree(path: str, tree) -> None:
    """Save a pytree checkpoint with orbax (train_util.py:296-319 parity)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_pytree(path: str, target=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(os.path.abspath(path), item=target)
    return ckptr.restore(os.path.abspath(path))


def load_params(path: str, model=None, init_args=None, model_name: str = ""):
    """Load model params from an orbax dir, a ``.npz`` flat file, or a torch
    ``.pt``/``.pth`` checkpoint (dispatched through the per-model converter in
    flair_tpu.utils.convert, keyed by ``model_name``)."""
    if path.endswith(".npz"):
        flat = dict(np.load(path, allow_pickle=False))
        return unflatten_params(flat)
    if path.endswith((".pt", ".pth")):
        from . import convert

        converters = {
            "codeformer": convert.convert_codeformer,
            "parsenet": convert.convert_parsenet,
            "spynet": convert.convert_spynet,
        }
        for extra in ("convert_retinaface", "convert_bicubic_unet",
                      "convert_blur_unet"):
            if hasattr(convert, extra):
                converters[extra.removeprefix("convert_")] = getattr(
                    convert, extra
                )
        if model_name not in converters:
            raise ValueError(
                f"no torch converter registered for {model_name!r}; "
                f"known: {sorted(converters)}"
            )
        return converters[model_name](load_torch_state_dict(path))
    return load_pytree(path)


# ---------------------------------------------------------------------------
# Flat-dict helpers (npz round trips; also used by the torch converter)
# ---------------------------------------------------------------------------


def flatten_params(tree, sep: str = "/") -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = sep.join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray], sep: str = "/"):
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return tree


# ---------------------------------------------------------------------------
# torch → flax conversion primitives
# ---------------------------------------------------------------------------


def t2j_conv2d(w: np.ndarray) -> np.ndarray:
    """torch Conv2d (O, I, kh, kw) → flax HWIO (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def t2j_conv3d(w: np.ndarray) -> np.ndarray:
    """torch Conv3d (O, I, kt, kh, kw) → flax (kt, kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 4, 1, 0))


def t2j_linear(w: np.ndarray) -> np.ndarray:
    """torch Linear (O, I) → flax (I, O)."""
    return np.transpose(w)


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a torch checkpoint into numpy (CPU, no grad)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "params_ema" in obj:
        obj = obj["params_ema"]
    return {k: v.detach().numpy() for k, v in obj.items() if hasattr(v, "detach")}


def convert_torch_params(
    state: Mapping[str, np.ndarray],
    mapping: Mapping[str, tuple[str, Optional[Callable]]],
) -> dict:
    """Apply a {torch_name: (flax_path, transform)} mapping → params pytree.

    ``transform`` defaults to identity; use the t2j_* helpers for layout.
    """
    flat = {}
    for tname, (jpath, tf) in mapping.items():
        if tname not in state:
            raise KeyError(f"missing torch param: {tname}")
        val = state[tname]
        flat[jpath] = (tf or (lambda x: x))(val)
    return unflatten_params(flat)
