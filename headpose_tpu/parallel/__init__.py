"""Parallelism: device meshes, sharding helpers, multi-host bring-up."""
from .mesh import (create_mesh, replicate, shard_rows, shard_batch,
                   head_param_specs, shard_head_params,
                   DATA_AXIS, MODEL_AXIS)
from .distributed import (initialize_distributed, global_mesh,
                          host_local_batch, is_distributed)

__all__ = ["create_mesh", "replicate", "shard_rows", "shard_batch",
           "head_param_specs", "shard_head_params",
           "DATA_AXIS", "MODEL_AXIS",
           "initialize_distributed", "global_mesh", "host_local_batch",
           "is_distributed"]
