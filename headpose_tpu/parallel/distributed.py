"""Multi-host (multi-process) runtime initialization.

The reference is strictly single-process (SURVEY.md §2: no tf.distribute, no
MPI/NCCL anywhere).  The TPU-native scaling story has two tiers:

  * single-slice: one process, all chips reachable over ICI — `create_mesh`
    (mesh.py) covers this; nothing here is needed.
  * multi-host / multi-slice: one process per host, chips coordinated through
    JAX's distributed runtime; collectives ride ICI within a slice and DCN
    across slices.  This module owns that bring-up.

Usage (same script on every host):

    from headpose_tpu.parallel import initialize_distributed, global_mesh
    initialize_distributed()          # no-op single-process; env-driven on pods
    mesh = global_mesh(model_parallel=1)
    ...
    batch = host_local_batch(mesh, local_rows)   # per-host rows → global array

On TPU pods `jax.distributed.initialize()` auto-discovers the coordinator
from the TPU metadata; elsewhere pass coordinator_address/num_processes/
process_id explicitly (or set JAX_COORDINATOR_ADDRESS etc.).  The mesh
places 'data' outermost so the gradient psum's large all-reduce segments
stay on ICI within each process's local devices and only the small
cross-host segment crosses DCN.

Executed multi-process for real (not just the single-process degenerate
form): tests/test_multihost.py joins two OS processes x 4 CPU devices over
localhost and runs the full train.fit dp path on the 8-device GLOBAL mesh,
matching the single-process run.  Checkpoint caveat proven there: orbax's
save barrier is keyed by the checkpoint path, so cfg.checkpoint_dir and
run_name must be IDENTICAL on every process (per-process dirs deadlock the
cluster at the first save).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

__all__ = ["initialize_distributed", "global_mesh", "host_local_batch",
           "is_distributed"]

_initialized = False


def is_distributed() -> bool:
    """True when running under a multi-process JAX runtime."""
    return jax.process_count() > 1


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           local_device_ids: Sequence[int] | None = None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    Single-process runs (num_processes in (None, 1) and no coordinator
    configured) are a no-op, so the same training script works from a laptop
    CPU to a multi-host pod.  Arguments mirror jax.distributed.initialize;
    None values fall back to JAX's env/TPU-metadata auto-detection.
    """
    global _initialized
    if _initialized:
        return
    # ANY explicit argument requests cluster bring-up — a caller passing
    # only process_id/local_device_ids (relying on metadata auto-detection
    # for the rest) must not be silently no-op'd into num_processes=1
    # training that writes the shared checkpoint dir from every host
    explicit = (coordinator_address is not None
                or num_processes not in (None, 1)
                or process_id is not None
                or local_device_ids is not None)
    import os
    env = any(os.environ.get(k) for k in
              ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS"))
    # TPU pods export TPU_WORKER_HOSTNAMES as a comma-separated host list;
    # a single entry (e.g. 'localhost' from single-host runtimes) is not a
    # pod.  SLURM/OMPI multi-node jobs are detectable by their env too —
    # bare jax.distributed.initialize() would auto-detect those clusters.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    slurm = os.environ.get("SLURM_NTASKS")
    ompi = os.environ.get("OMPI_COMM_WORLD_SIZE")
    multi = any(v and int(v) > 1 for v in (slurm, ompi))
    auto_pod = ("," in hosts) or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS") or multi
    if not (explicit or env or auto_pod):
        return  # single process: plain jit/pjit path, nothing to bring up
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    _initialized = True


def global_mesh(model_parallel: int = 1,
                devices: Sequence[jax.Device] | None = None) -> Mesh:
    """A (data, model) mesh over ALL global devices, laid out so each
    process's local devices are contiguous along 'data' (gradient reduction
    segments ride ICI; only the cross-host hop crosses DCN).  jax.devices()
    already orders devices by process index, so the reshape preserves
    process contiguity.  Delegates to mesh.create_mesh — ONE place owns the
    grid layout."""
    from .mesh import create_mesh

    return create_mesh(model_parallel=model_parallel, devices=devices)


def host_local_batch(mesh: Mesh, local_rows: Any) -> Any:
    """Assemble a globally-sharded batch from per-process rows.

    Each process passes only ITS shard of the global batch (leading axis);
    the result is one global jax.Array sharded P('data') over the mesh —
    the multi-host replacement for device_put'ing a full batch (which would
    require every host to hold all rows).  Works unchanged single-process.
    """
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        local_rows)
