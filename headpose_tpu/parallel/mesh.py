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
           "head_param_specs", "shard_head_params",
           "DATA_AXIS", "MODEL_AXIS"]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(n_devices: int | None = None, model_parallel: int = 1,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a (data, model) mesh.  model_parallel=1 yields the 1-D data mesh
    that is the right default for these model sizes (SURVEY.md §5.8)."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if len(devs) < n_devices:
            # silently building a narrower mesh would let callers 'validate'
            # multi-device behavior at a width they never actually ran
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devs)} devices are available")
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


# ---------------------------------------------------------------- tensor par
def _dense_pair_specs(sizes: list[int], tp: int):
    """Megatron-style column→row PartitionSpecs for a dense chain whose layer
    i maps sizes[i] → sizes[i+1]: even layers shard the OUTPUT dim over
    'model', odd layers shard the INPUT dim (XLA inserts the psum), the tail
    of an odd-length chain stays replicated.  Dims not divisible by the
    model-axis size fall back to replication (sharding would be ragged)."""
    n = len(sizes) - 1
    specs = []
    for i in range(n):
        din, dout = sizes[i], sizes[i + 1]
        if i % 2 == 0 and i < n - 1 and dout % tp == 0:
            specs.append({"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)})
        elif i % 2 == 1 and din % tp == 0 and specs[-1]["b"] == P(MODEL_AXIS):
            specs.append({"w": P(MODEL_AXIS, None), "b": P()})
        else:
            specs.append({"w": P(), "b": P()})
    return specs


def head_param_specs(spec: Any, params: Any, tp: int) -> Any:
    """Tensor-parallel PartitionSpecs for ANY pose-head family, derived from
    the head's spec (SURVEY.md §5.8): hidden dimensions shard over 'model'
    in column→row pairs so activations leave every module replicated.

    MLP chains pair consecutive layers; residual/skip blocks shard their
    internal pair (block boundaries stay replicated to match the skip);
    the SE-Transformer shards attention across heads plus its FFN/fc pairs.
    Anything not divisible by the model-axis size stays replicated.
    """
    from ..models import heads as H

    if isinstance(spec, H.MLPHead):
        sizes = [spec.in_features] + [c for c, _ in spec.layers]
        return {"layers": _dense_pair_specs(sizes, tp)}
    if isinstance(spec, H.ResidualMLPHead):
        blk = _dense_pair_specs([spec.width] * 3, tp)
        return {"proj": {"w": P(), "b": P()},
                "blocks": [{"fc1": blk[0], "fc2": blk[1]}
                           for _ in range(spec.num_blocks)],
                "bottleneck": {"w": P(), "b": P()},
                "out": {"w": P(), "b": P()}}
    if isinstance(spec, H.SkipMLPHead):
        pair = _dense_pair_specs([spec.enc1, spec.enc2, spec.enc1], tp)
        return {"enc1": {"w": P(), "b": P()},
                "enc2": pair[0], "dec": pair[1],
                "out": {"w": P(), "b": P()}}
    if isinstance(spec, H.SEMLPHead):
        fc_pair = _dense_pair_specs(
            [spec.in_features, spec.hidden, spec.out_features], tp)
        mid = spec.in_features // spec.reduction
        se_pair = _dense_pair_specs(
            [spec.in_features, mid, spec.in_features], tp)
        return {"se": {"fc1": se_pair[0], "fc2": se_pair[1]},
                "fc": fc_pair[0], "out": fc_pair[1]}
    if isinstance(spec, H.SETransformerHead):
        mid = spec.in_features // spec.reduction
        se_pair = _dense_pair_specs(
            [spec.in_features, mid, spec.in_features], tp)
        ff_pair = _dense_pair_specs(
            [spec.in_features, spec.ff_dim, spec.in_features], tp)
        fc_pair = _dense_pair_specs(
            [spec.in_features, spec.hidden, spec.out_features], tp)
        heads_ok = spec.num_heads % tp == 0
        qkv = ({"w": P(None, MODEL_AXIS, None), "b": P(MODEL_AXIS, None)}
               if heads_ok else {"w": P(), "b": P()})
        attn_out = ({"w": P(MODEL_AXIS, None, None), "b": P()}
                    if heads_ok else {"w": P(), "b": P()})
        return {"se": {"fc1": se_pair[0], "fc2": se_pair[1]},
                "query": qkv, "key": qkv, "value": qkv,
                "attn_out": attn_out,
                "ln1": {"g": P(), "b": P()},
                "ff1": ff_pair[0], "ff2": ff_pair[1],
                "ln2": {"g": P(), "b": P()},
                "fc": fc_pair[0], "out": fc_pair[1]}
    if isinstance(spec, H.EnsembleHead):
        # each member shards independently under its own family rule; the
        # final average is elementwise on replicated outputs
        return {"members": [head_param_specs(m, p, tp)
                            for m, p in zip(spec.members, params["members"])]}
    # unknown family: replicate everything (correct, just not model-parallel)
    return jax.tree_util.tree_map(lambda _: P(), params)


def shard_head_params(spec: Any, params: Any, mesh: Mesh) -> Any:
    """Place head params on the mesh under the family's TP specs."""
    tp = mesh.shape[MODEL_AXIS]
    pspecs = head_param_specs(spec, params, tp)
    return jax.tree_util.tree_map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        params, pspecs, is_leaf=lambda x: isinstance(x, P))
