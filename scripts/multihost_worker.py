"""One process of a REAL multi-process (DCN-style) training validation.

Round 2 built the multi-host machinery (parallel/distributed.py:
initialize_distributed / global_mesh / host_local_batch) but could only
test its single-process degenerate forms — "real multi-host execution
needs a pod" (docs/ROADMAP.md).  It does not: JAX's distributed runtime
runs multiple PROCESSES on one machine over localhost gRPC/Gloo, each
owning a disjoint set of CPU devices — the same coordinator/collective
path a TPU pod's hosts use (minus ICI).  This worker is one such process;
tests/test_multihost.py spawns two of them and asserts the trained result
equals the single-process run.

Usage (spawned by the test, or by hand):
  XLA_FLAGS=--xla_force_host_platform_device_count=4 \\
    python scripts/multihost_worker.py --process_id 0 --num_processes 2 \\
      --port 39759 --ckpt_dir /shared/tmp --out /tmp/p0.json &
  ... same with --process_id 1 ...

Checkpoint coordination gotcha (found the hard way): orbax's save runs a
global barrier KEYED BY THE CHECKPOINT PATH, so ckpt_dir/run_name must be
IDENTICAL on every process — per-process dirs deadlock the cluster at the
first improvement save.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--ckpt_dir", required=True,
                    help="SHARED checkpoint dir (identical on all processes)")
    ap.add_argument("--out", required=True, help="result JSON path")
    ap.add_argument("--total_epochs", type=int, default=6)
    ap.add_argument("--detect", action="store_true",
                    help="also run dp detection serving over the global "
                         "mesh and record this process's local shard")
    args = ap.parse_args()

    import jax

    # this container pins an axon TPU plugin via sitecustomize; the env var
    # is overridden, so force CPU through the config (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

    from headpose_tpu.parallel.distributed import (global_mesh,
                                                   initialize_distributed)

    initialize_distributed(
        coordinator_address=f"localhost:{args.port}",
        num_processes=args.num_processes, process_id=args.process_id)

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from headpose_tpu.data import Dataset
    from headpose_tpu.train import config_96, fit

    mesh = global_mesh()
    assert jax.process_count() == args.num_processes

    from headpose_tpu.parallel.distributed import host_local_batch

    # host_local_batch is the pod data path: each host contributes ONLY its
    # local rows and the results assemble into one global array.  Validate
    # it for real: per-process disjoint halves must equal the
    # global-semantics device_put of the full array, shard by shard.
    import jax.numpy as jnp

    full = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    n_local = 16 // args.num_processes
    local = full[args.process_id * n_local:(args.process_id + 1) * n_local]
    garr = host_local_batch(mesh, local)
    want = jax.device_put(full, NamedSharding(mesh, P(mesh.axis_names[0])))
    diff = float(jax.jit(lambda a, b: jnp.abs(a - b).max(),
                         out_shardings=NamedSharding(mesh, P()))(garr, want))
    assert diff == 0.0, f"host_local_batch mismatch: {diff}"
    print(f"[{args.process_id}] host_local_batch assembles the global "
          "batch exactly", flush=True)
    # every process feeds the same (small) dataset; fit shards it over the
    # global 'data' axis — the same global-semantics device_put a pod uses
    rng = np.random.default_rng(0)
    x = rng.normal(size=(256, 16)).astype(np.float32)
    y = (x @ rng.normal(size=(16, 3))).astype(np.float32)
    cfg = config_96(in_features=16, num_filters=8,
                    total_epochs=args.total_epochs, batch_size=64,
                    checkpoint_dir=args.ckpt_dir, run_name="multihost")
    res = fit(cfg, Dataset(x, y), mesh=mesh)

    leaves = jax.tree_util.tree_leaves(res.params)
    out = {
        "process_id": args.process_id,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "mesh": dict(zip(mesh.axis_names,
                         (int(n) for n in mesh.devices.shape))),
        "val_history": [float(h["val_loss"]) for h in res.history],
        "best_epoch": int(res.best_epoch),
        "param_l1": float(sum(float(np.abs(np.asarray(l)).sum())
                              for l in leaves)),
    }
    # tp/dp training step over a 4x2 GLOBAL mesh: head hidden weights shard
    # over 'model' via the general per-family rules (parallel.
    # head_param_specs) — executed across processes, not just the
    # single-process 8-device mesh of tests/test_parallel.py
    import optax

    from headpose_tpu.models import MLPHead
    from headpose_tpu.parallel import shard_head_params
    from headpose_tpu.train.loop import _loss_and_metrics

    mesh2 = global_mesh(model_parallel=2)
    spec = MLPHead(96, ((64, "tanh"), (3, "linear")), dropout_rate=0.01)
    params = shard_head_params(spec, spec.init(jax.random.PRNGKey(0)), mesh2)
    optimizer = optax.adam(2.8e-4, eps=1e-7)
    opt_state = jax.device_put(optimizer.init(params), NamedSharding(mesh2, P()))
    rng2 = np.random.default_rng(1)
    batch = {
        "x": rng2.normal(size=(64, 96)).astype(np.float32),
        "y": rng2.normal(size=(64, 3)).astype(np.float32),
        "w": np.ones((64,), np.float32),
        "mask": np.ones((64,), np.float32),
    }
    row2 = NamedSharding(mesh2, P(mesh2.axis_names[0]))
    batch = {k: jax.device_put(v, row2) for k, v in batch.items()}

    @jax.jit
    def tp_step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _loss_and_metrics(spec, p, batch, jax.random.PRNGKey(1),
                                        1e-6, True), has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, tp_loss = tp_step(params, opt_state, batch)
    jax.block_until_ready(params)
    out["tp_step_loss"] = float(tp_loss)
    out["tp_mesh"] = dict(zip(mesh2.axis_names,
                              (int(n) for n in mesh2.devices.shape)))
    print(f"[{args.process_id}] tp/dp step on the multi-process 4x2 mesh: "
          f"loss {out['tp_step_loss']:.6f}", flush=True)

    if args.detect:
        # dp detection serving over the SAME global mesh: every process
        # feeds the identical host batch; jit shards it over 'data', each
        # process computes its local rows ('auto' postprocess resolves to
        # the XLA backend on this CPU mesh)
        from headpose_tpu.pretrained import flagship_detector

        det = flagship_detector(mesh=mesh)
        g = np.load(os.path.join(REPO, "tests", "golden",
                                 "e2e_production.npz"))
        img = np.asarray(jax.image.resize(
            np.asarray(g["img"], np.float32), (128, 128, 3),
            "linear")).astype(np.uint8)
        frames = np.stack([np.roll(img, i, axis=1) for i in range(8)])
        sharded = jax.device_put(frames,
                                 NamedSharding(mesh, P(mesh.axis_names[0])))
        res = det.detect(sharded)
        shards = {}
        for name in ("valid", "poses", "boxes", "scores"):
            arr = getattr(res, name)
            for sh in arr.addressable_shards:
                row0 = sh.index[0].start or 0
                for k, row in enumerate(np.asarray(sh.data)):
                    shards.setdefault(str(row0 + k), {})[name] = row.tolist()
        out["detection_local_rows"] = shards

    with open(args.out, "w") as f:
        json.dump(out, f)
    print(f"[{args.process_id}] wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
