"""Unified pose-detection model: BlazeFace backbone + grafted pose heads.

The reference builds this via Keras graph surgery (JoinModels.py:5-90 — load
three H5s, tap re_lu_10/re_lu_15, insert Reshape, re-save).  In a functional
framework the unified model is just composition: the backbone forward yields
the two feature maps and the pose heads are applied to them in the same XLA
program.  "Joining" is constructing this dataclass — no serialization round
trip, no layer-name string matching, no shape rewriting.

Output contract (parity with JoinModels.py:152-158, verified by execution):
  scores     (B, 896)        — cls_front (512) ++ cls_back (384) logits
  loc        (B, 896, 16)    — raw [sx, sy, w, h, 6x(kx, ky)] per anchor
  pose_front (B, 16, 16, 3)  — yaw/pitch/roll map over the 16x16 grid
  pose_back  (B, 8, 8, 3)    — yaw/pitch/roll map over the 8x8 grid
plus reference_outputs() reshaping to the exact 6-tensor H5 signature.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax

from .blazeface import BlazeFace, BLAZEFACE_FRONT, blazeface_from_modeldef
from .heads import mlp_head_from_modeldef

__all__ = ["UnifiedPoseModel", "unified_from_h5", "join_models"]

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UnifiedPoseModel:
    """BlazeFace + two pose-regression heads, one fused forward."""

    backbone: BlazeFace = BLAZEFACE_FRONT
    head88: Any = None  # pose head consuming feat88 (16x16x88)
    head96: Any = None  # pose head consuming feat96 (8x8x96)

    def apply(self, params: Params, x, *, dtype=None,
              dense: bool = False,
              fast_blocks: tuple[int, ...] | None = None,
              simulate_fast: bool | str = False,
              heads: bool = True) -> dict[str, jax.Array]:
        out = self.backbone.apply(params["backbone"], x, dtype=dtype,
                                  dense=dense, fast_blocks=fast_blocks,
                                  simulate_fast=simulate_fast)
        # heads=False skips the pose maps (no pose_front/pose_back in the
        # result): the detector's survivors-only serving profile evaluates
        # the heads AFTER NMS on the gathered per-face feature vectors
        # instead of over every map cell (runtime.detector head_eval)
        if heads and self.head88 is not None:
            out["pose_front"] = self.head88.apply(params["head88"], out["feat88"])
        if heads and self.head96 is not None:
            out["pose_back"] = self.head96.apply(params["head96"], out["feat96"])
        return out

    def reference_outputs(self, params: Params, x):
        """The exact 6-output signature of the reference unified H5
        (cls_front, cls_back, loc_front, loc_back, pose_front, pose_back)."""
        out = self.apply(params, x)
        B = x.shape[0]
        scores, loc = out["scores"], out["loc"]
        return (
            scores[:, :512].reshape(B, 512, 1),
            scores[:, 512:].reshape(B, 384, 1),
            loc[:, :512].reshape(B, 512, 16),
            loc[:, 512:].reshape(B, 384, 16),
            out["pose_front"],
            out["pose_back"],
        )


def join_models(backbone_spec: BlazeFace, backbone_params: Params,
                head88: Any, head88_params: Params,
                head96: Any, head96_params: Params) -> tuple[UnifiedPoseModel, Params]:
    """Functional equivalent of JoinModels.join_models: compose a detector with
    two trained pose heads.  Returns (model, params) ready for runtime use or
    checkpointing — grafting is composition, not graph surgery."""
    model = UnifiedPoseModel(backbone=backbone_spec, head88=head88, head96=head96)
    params = {"backbone": backbone_params,
              "head88": head88_params, "head96": head96_params}
    return model, params


def unified_from_h5(path: str) -> tuple[UnifiedPoseModel, Params]:
    """Import a reference unified H5 (BlazePoser/UnifiedModels/*.h5) — backbone,
    SSD heads, and both nested pose regressors — into the native model."""
    from ..core.h5io import read_model

    md = read_model(path)  # parsed ONCE; backbone import shares the graph
    spec, backbone_params = blazeface_from_modeldef(md)
    heads = []
    for name in md.order:
        layer = md.layers[name]
        if layer.submodel is not None:
            heads.append(mlp_head_from_modeldef(layer.submodel))
    if len(heads) != 2:
        raise ValueError(f"{path}: expected 2 nested pose heads, found {len(heads)}")
    (h88, p88), (h96, p96) = heads
    if h88.in_features != 88:  # order by attach point, not file order
        (h88, p88), (h96, p96) = (h96, p96), (h88, p88)
    return join_models(spec, backbone_params, h88, p88, h96, p96)
