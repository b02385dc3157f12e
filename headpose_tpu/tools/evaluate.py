"""Standalone head evaluation — parity with Model-96/test.py:9-69.

evaluate_head_pose_model(model, dataset) → per-angle + average MAE/MSE dict,
printed in the same format.  Accepts a native (spec, params) pair, a path to
a reference H5 head, or a path to a saved native checkpoint.
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import numpy as np

from ..data.datasets import Dataset, load_dataset

__all__ = ["evaluate_head_pose_model", "pose_metrics"]

ANGLES = ("yaw", "pitch", "roll")


@functools.lru_cache(maxsize=64)
def _apply_highest(fn):
    """Jitted fn with MXU precision pinned to 'highest' inside the trace —
    parity numbers (compared to the reference at 0.01-deg resolution) must
    not drift with the ambient precision (CLAUDE.md).

    Cached at module level: head specs are frozen dataclasses, so equal
    architectures yield equal bound `spec.apply` methods and the SAME jitted
    program — a fresh jax.jit closure per call would retrace and recompile
    every evaluation (~30-90 s each through this container's TPU tunnel)."""
    def wrapped(p, x):
        with jax.default_matmul_precision("highest"):
            return fn(p, x)
    return jax.jit(wrapped)


def pose_metrics(predictions: np.ndarray, ground_truth: np.ndarray) -> dict:
    """Per-angle and average MAE/MSE, same schema as the reference evaluator."""
    predictions = predictions.reshape(ground_truth.shape)
    err = predictions - ground_truth
    mae = np.mean(np.abs(err), axis=0)
    mse = np.mean(np.square(err), axis=0)
    metrics = {
        "MAE": {a: float(mae[i]) for i, a in enumerate(ANGLES)},
        "MSE": {a: float(mse[i]) for i, a in enumerate(ANGLES)},
    }
    metrics["MAE"]["average"] = float(mae.mean())
    metrics["MSE"]["average"] = float(mse.mean())
    return metrics


def _print_metrics(metrics: dict) -> None:
    print("Evaluation Results:")
    print("------------------")
    for kind in ("MAE", "MSE"):
        label = ("Mean Absolute Error (MAE):" if kind == "MAE"
                 else "\nMean Squared Error (MSE):")
        print(label)
        for a in ANGLES:
            print(f"  {a}: {metrics[kind][a]:.4f}")
        print(f"  Average: {metrics[kind]['average']:.4f}")


def evaluate_head_pose_model(model: Any, dataset: Any,
                             params: Any = None, verbose: bool = True) -> dict:
    """Evaluate a pose head on a feature dataset.

    model: (spec with .apply) | path to an H5 head | GraphModel
    dataset: Dataset | path to an .npz
    params: native params when model is a spec
    """
    if isinstance(dataset, str):
        dataset = load_dataset(dataset)
    assert isinstance(dataset, Dataset)

    if isinstance(model, str):
        from ..models.heads import head_from_h5
        spec, params = head_from_h5(model)
        preds = _apply_highest(spec.apply)(params, dataset.features)
    elif params is not None:
        preds = _apply_highest(model.apply)(params, dataset.features)
    else:  # GraphModel-like callable; reference feeds (N,1,1,C) — GraphModel
        # already defaults to matmul_precision='highest'
        x = dataset.features.reshape(len(dataset), 1, 1, dataset.num_features)
        preds = model(x)

    metrics = pose_metrics(np.asarray(preds), dataset.poses)
    if verbose:
        _print_metrics(metrics)
    return metrics
