"""User-facing tools: evaluation, joining, conversion, benchmarking."""
from .evaluate import evaluate_head_pose_model, pose_metrics

__all__ = ["evaluate_head_pose_model", "pose_metrics"]
