"""Parallelism: device meshes and sharding helpers (data + tensor parallel)."""
from .mesh import (create_mesh, replicate, shard_rows, shard_batch,
                   head_param_specs, shard_head_params,
                   DATA_AXIS, MODEL_AXIS)

__all__ = ["create_mesh", "replicate", "shard_rows", "shard_batch",
           "head_param_specs", "shard_head_params",
           "DATA_AXIS", "MODEL_AXIS"]
