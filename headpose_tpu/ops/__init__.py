"""TPU-first ops: preprocessing, detection post-processing, Pallas kernels."""
from .image import bicubic_matrix, resize_bicubic, preprocess
from .detection import (
    MAX_FACES, decode_boxes, decode_keypoints, pairwise_iou,
    nms_static, gather_poses, postprocess,
)

__all__ = [
    "bicubic_matrix", "resize_bicubic", "preprocess",
    "MAX_FACES", "decode_boxes", "decode_keypoints", "pairwise_iou",
    "nms_static", "gather_poses", "postprocess",
]
