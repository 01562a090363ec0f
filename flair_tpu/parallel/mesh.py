"""Device mesh + sharding helpers.

Mapping from the reference's parallelism inventory (SURVEY.md §2.3):
- DDP data parallelism (train_util.py:125-132, NCCL all-reduce) →
  ``data`` mesh axis; gradients are psum'd by GSPMD inside the jitted step.
- weight broadcast at init (dist_util.py:40-79) → ``replicate_params``
  (single device_put with a fully-replicated sharding).
- sequence (frame) parallelism — absent in the reference, which slides
  10-frame windows on one GPU (§5.7) → ``frame`` mesh axis over T, with
  halo exchange for the 7-frame temporal attention (parallel.halo).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axes: Sequence[str] = ("data", "frame"),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n devices.

    Default layout: all devices on ``data`` with ``frame`` = 1; pass
    ``shape`` to split, e.g. shape=(2, 4) for 2-way data × 4-way frame.
    """
    devs = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devs)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int = 5) -> NamedSharding:
    """(B, T, ...) batch sharded: B over 'data', T over 'frame'."""
    spec = [None] * ndim
    spec[0] = "data"
    if "frame" in mesh.axis_names and ndim > 1:
        spec[1] = "frame"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of (B, T, ...) arrays with batch/frame sharding."""
    def put(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


def replicate_params(mesh: Mesh, params):
    """Replicate a parameter pytree across the mesh — the TPU equivalent of
    the reference's chunked rank-0 broadcast (dist_util.py:40-79)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), params)
