"""Pallas TPU kernels for the hot ops."""
from .backbone import backbone_forward
from .head_mlp import mlp_head_forward
from .se_attention import se_transformer_forward

__all__ = ["backbone_forward", "mlp_head_forward", "se_transformer_forward"]
