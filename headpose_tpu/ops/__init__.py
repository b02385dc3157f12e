"""TPU-first ops: preprocessing, detection post-processing, Pallas kernels."""
from .image import bicubic_matrix, resize_bicubic, preprocess
from .detection import (
    MAX_FACES, decode_boxes, decode_keypoints, pairwise_iou,
    nms_static, anchor_cells, gather_poses, postprocess,
    score_threshold_to_logit, sanitize_model_outputs,
)

__all__ = [
    "bicubic_matrix", "resize_bicubic", "preprocess",
    "MAX_FACES", "decode_boxes", "decode_keypoints", "pairwise_iou",
    "nms_static", "anchor_cells", "gather_poses", "postprocess",
    "score_threshold_to_logit", "sanitize_model_outputs",
]
