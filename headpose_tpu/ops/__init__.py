"""TPU-first ops: preprocessing, detection post-processing, Pallas kernels.

Exports resolve lazily (PEP 562) so light consumers — the edge pipeline
needs only `bicubic` (numpy-only interpolation matrices) — don't pay for
(or require) the JAX import the compute modules carry.
"""
import importlib

_EXPORTS = {
    "bicubic_matrix": ".bicubic", "resize_bicubic_np": ".bicubic",
    "resize_bicubic": ".image", "preprocess": ".image",
    "MAX_FACES": ".detection", "decode_boxes": ".detection",
    "decode_keypoints": ".detection", "pairwise_iou": ".detection",
    "nms_static": ".detection", "anchor_cells": ".detection",
    "gather_poses": ".detection", "postprocess": ".detection",
    "score_threshold_to_logit": ".detection",
    "sanitize_model_outputs": ".detection",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        value = getattr(importlib.import_module(_EXPORTS[name], __name__), name)
        globals()[name] = value           # cache: __getattr__ runs once
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return __all__
