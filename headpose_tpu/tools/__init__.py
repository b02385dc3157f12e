"""User-facing tools: evaluation, conversion, joining, export, CLIs."""
from .evaluate import evaluate_head_pose_model, pose_metrics
from .export import save_model, load_model, spec_to_dict, spec_from_dict
from .convert import convert_head, validate_conversion, batch_convert
from .join_cli import join_and_save, extract_id_from_path
from .aot import export_detector, load_exported, ExportedDetector

__all__ = [
    "evaluate_head_pose_model", "pose_metrics",
    "save_model", "load_model", "spec_to_dict", "spec_from_dict",
    "convert_head", "validate_conversion", "batch_convert",
    "join_and_save", "extract_id_from_path",
    "export_detector", "load_exported", "ExportedDetector",
]
