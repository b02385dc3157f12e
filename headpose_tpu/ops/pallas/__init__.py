"""Pallas TPU kernels for the hot ops."""
from .head_mlp import mlp_head_forward
from .se_attention import se_transformer_forward

__all__ = ["mlp_head_forward", "se_transformer_forward"]
