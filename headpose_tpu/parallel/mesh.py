"""Device mesh + sharding utilities.

The reference is single-process/single-device with no distribution story
(SURVEY.md §2, §5.8).  The TPU-native equivalent: a jax.sharding.Mesh with a
'data' axis (batch/data parallelism — gradient psum rides ICI) and an optional
'model' axis (tensor parallelism over head hidden dimensions).  On one chip
everything degrades to plain jit; scaling out is a mesh-shape change, not a
code change.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "replicate", "shard_rows", "shard_batch",
           "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_devices: int | None = None, model_parallel: int = 1,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (data, model) mesh.  model_parallel=1 yields the 1-D data mesh
    that is the right default for these model sizes (SURVEY.md §5.8)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rows(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Shard every leaf's leading axis over the mesh axis (dataset rows)."""
    def put(a):
        return jax.device_put(a, NamedSharding(mesh, P(axis)))
    return jax.tree_util.tree_map(put, tree)


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Alias of shard_rows for image/feature batches."""
    return shard_rows(tree, mesh, axis)
