"""Native TPU-first model definitions: BlazeFace, pose-head zoo, unified model.

Exports resolve lazily (PEP 562) so light consumers — the edge pipeline needs
only `anchors`, which is numpy-only — don't pay for (or require) the JAX
import the other model modules carry.
"""
import importlib

_EXPORTS = {
    "AnchorConfig": ".anchors", "FRONT_CONFIG": ".anchors",
    "BACK_CONFIG": ".anchors", "generate_anchors": ".anchors",
    "BlazeFace": ".blazeface", "BLAZEFACE_FRONT": ".blazeface",
    "BLAZEFACE_BACK": ".blazeface", "blazeface_from_h5": ".blazeface",
    "MLPHead": ".heads", "ResidualMLPHead": ".heads", "SkipMLPHead": ".heads",
    "SEMLPHead": ".heads", "SETransformerHead": ".heads",
    "EnsembleHead": ".heads", "head_from_h5": ".heads",
    "head_from_keras_json": ".heads", "se_transformer_from_h5": ".heads",
    "mlp_head_from_modeldef": ".heads", "HEAD_REGISTRY": ".heads",
    "UnifiedPoseModel": ".unified", "unified_from_h5": ".unified",
    "join_models": ".unified",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        value = getattr(importlib.import_module(_EXPORTS[name], __name__), name)
        globals()[name] = value           # cache: __getattr__ runs once
        return value
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(__all__) | set(globals()))
