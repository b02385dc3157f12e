"""Checkpoint / resume via Orbax.

The reference only snapshots best-val-loss whole models through Keras
ModelCheckpoint, with no optimizer state and no resume (SURVEY.md §5.3-5.4).
Here checkpoints carry params + optimizer state + epoch counter + early-stop
bookkeeping, so interrupted training resumes exactly.
"""
from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_step",
           "save_pytree", "restore_pytree"]


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    """Save one pytree (e.g. best params) at path (replaces existing).

    Multi-process safe: orbax's save is a collective every process must
    enter, but the replace-existing cleanup must happen exactly once and
    BEFORE anyone starts writing — process 0 deletes, everyone barriers,
    then all enter the collective save."""
    path = os.path.abspath(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        multihost_utils.sync_global_devices(f"save_pytree_clean:{path}")
    elif os.path.exists(path):
        shutil.rmtree(path)
    _checkpointer().save(path, tree)


def restore_pytree(path: str, like: Any | None = None) -> Any:
    """Restore a pytree as host numpy arrays (device/backend-agnostic — a
    checkpoint written under one jax backend restores under any other; plain
    restore would try to materialize the saved shardings and fail across
    backends).  Orbax round-trips containers as plain lists/dicts; when
    ``like`` is given the restored leaves are re-imposed onto its typed
    structure (NamedTuple optimizer states etc.)."""
    import orbax.checkpoint as ocp

    ckptr = _checkpointer()
    path = os.path.abspath(path)
    meta = ckptr.metadata(path).item_metadata
    meta_tree = meta.tree if hasattr(meta, "tree") else meta
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree,
        is_leaf=lambda x: hasattr(x, "shape"))
    restored = ckptr.restore(path, restore_args=restore_args)
    if like is None:
        return restored
    treedef = jax.tree_util.tree_structure(like)
    leaves = jax.tree_util.tree_leaves(restored)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(ckpt_dir: str, step: int, params: Any, opt_state: Any,
                    extra: dict[str, Any] | None = None, keep: int = 3,
                    best_params: Any | None = None) -> None:
    """Save a full training checkpoint at ckpt_dir/step_<N>; prune old ones.

    params/opt_state must be a CONSISTENT pair (the live state at `step`).
    When the best weights differ from the live weights (block-mode training
    syncs after the best epoch has passed), pass them as `best_params` so
    resume restores the early-stopping bookkeeping exactly instead of
    treating the live weights as best."""
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step}")
    tree = {"params": params, "opt_state": opt_state}
    if best_params is not None:
        tree["best_params"] = best_params
    save_pytree(path, tree)
    if jax.process_index() == 0:    # host-side metadata/pruning: exactly once
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump({"step": step,
                       "has_best_params": best_params is not None,
                       **(extra or {})}, f, default=_to_py)
        steps = sorted(_steps(ckpt_dir))
        for old in steps[:-keep]:
            shutil.rmtree(os.path.join(ckpt_dir, f"step_{old}"),
                          ignore_errors=True)


def _steps(ckpt_dir: str) -> list[int]:
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", name)
        if m:
            out.append(int(m.group(1)))
    return out


def latest_step(ckpt_dir: str) -> int | None:
    steps = _steps(ckpt_dir)
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, like: Any | None = None
                       ) -> tuple[int, Any, Any, dict, Any] | None:
    """Restore the newest checkpoint → (step, params, opt_state, meta,
    best_params-or-None), or None if no checkpoint exists."""
    step = latest_step(ckpt_dir)
    if step is None:
        return None
    path = os.path.join(ckpt_dir, f"step_{step}")
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    if like is not None and meta.get("has_best_params"):
        like = {**like, "best_params": like["params"]}
    tree = restore_pytree(path, like)
    return (step, tree["params"], tree["opt_state"], meta,
            tree.get("best_params"))


def _to_py(v):
    # json.dumps `default` handler: numeric leaves through the shared
    # converter (train.logging.to_jsonable), anything else degrades to str
    from .logging import to_jsonable

    j = to_jsonable(v)
    return j if j is not v else str(v)
