"""Native model serialization: spec JSON + Orbax params.

The reference's only model format is Keras H5 (opaque graph + weights).  The
native format here is a directory:
    spec.json   — model architecture (frozen dataclass fields, recursive)
    params/     — Orbax pytree checkpoint
Anything saved with save_model round-trips with load_model; reference H5
artifacts are one-way imported via models.{head_from_h5, unified_from_h5} and
can then be re-saved natively.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

from ..models.blazeface import BlazeFace
from ..models.heads import (MLPHead, ResidualMLPHead, SkipMLPHead, SEMLPHead,
                            SETransformerHead, EnsembleHead)
from ..models.unified import UnifiedPoseModel
from ..train.checkpoints import restore_pytree, save_pytree

__all__ = ["save_model", "load_model", "spec_to_dict", "spec_from_dict"]

_SPEC_CLASSES = {cls.__name__: cls for cls in (
    MLPHead, ResidualMLPHead, SkipMLPHead, SEMLPHead, SETransformerHead,
    EnsembleHead, BlazeFace, UnifiedPoseModel)}


def _encode(value: Any) -> Any:
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        if type(value).__name__ not in _SPEC_CLASSES:
            raise ValueError(f"unknown spec type {type(value).__name__}")
        return {"__spec__": type(value).__name__,
                "fields": {f.name: _encode(getattr(value, f.name))
                           for f in dataclasses.fields(value)}}
    if isinstance(value, tuple):
        return {"__tuple__": [_encode(v) for v in value]}
    if isinstance(value, list):
        return [_encode(v) for v in value]
    return value


def _decode(value: Any) -> Any:
    if isinstance(value, dict) and "__spec__" in value:
        cls = _SPEC_CLASSES[value["__spec__"]]
        return cls(**{k: _decode(v) for k, v in value["fields"].items()})
    if isinstance(value, dict) and "__tuple__" in value:
        return tuple(_decode(v) for v in value["__tuple__"])
    if isinstance(value, list):
        return [_decode(v) for v in value]
    return value


def spec_to_dict(spec: Any) -> dict:
    return _encode(spec)


def spec_from_dict(d: dict) -> Any:
    return _decode(d)


def save_model(path: str, spec: Any, params: Any,
               metadata: dict | None = None) -> None:
    """Save (spec, params) as a native model directory."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "spec.json"), "w") as f:
        json.dump({"spec": spec_to_dict(spec), "metadata": metadata or {}},
                  f, indent=2)
    save_pytree(os.path.join(path, "params"), params)


def load_model(path: str) -> tuple[Any, Any]:
    """Load a native model directory → (spec, params).  Params are committed
    to the default device — host-resident numpy params would re-transfer on
    every jitted call."""
    import jax
    import jax.numpy as jnp

    with open(os.path.join(path, "spec.json")) as f:
        doc = json.load(f)
    spec = spec_from_dict(doc["spec"])
    params = restore_pytree(os.path.join(path, "params"))
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return spec, params
