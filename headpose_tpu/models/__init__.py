"""Native TPU-first model definitions: BlazeFace, pose-head zoo, unified model."""
from .anchors import AnchorConfig, BACK_CONFIG, FRONT_CONFIG, generate_anchors
from .blazeface import BlazeFace, BLAZEFACE_FRONT, BLAZEFACE_BACK, blazeface_from_h5
from .heads import (
    MLPHead, ResidualMLPHead, SkipMLPHead, SEMLPHead, SETransformerHead,
    EnsembleHead, head_from_h5, head_from_keras_json, se_transformer_from_h5,
    mlp_head_from_modeldef, HEAD_REGISTRY,
)
from .unified import UnifiedPoseModel, unified_from_h5, join_models

__all__ = [
    "AnchorConfig", "FRONT_CONFIG", "BACK_CONFIG", "generate_anchors",
    "BlazeFace", "BLAZEFACE_FRONT", "BLAZEFACE_BACK", "blazeface_from_h5",
    "MLPHead", "ResidualMLPHead", "SkipMLPHead", "SEMLPHead",
    "SETransformerHead", "EnsembleHead", "head_from_h5", "head_from_keras_json",
    "se_transformer_from_h5",
    "mlp_head_from_modeldef", "HEAD_REGISTRY",
    "UnifiedPoseModel", "unified_from_h5", "join_models",
]
