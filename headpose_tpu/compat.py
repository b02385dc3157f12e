"""Drop-in compatibility shim for the reference API.

Users of the reference instantiate ``blazeFaceDetector(scoreThreshold,
iouThreshold)`` and call ``detectFaces(image)`` / ``drawDetections(img,
results)`` (BlazePoser/blazeFaceDetectorH5.py:80-126,175-219).  This module
exposes the same names on top of the TPU runtime, so reference call sites work
unchanged:

    from headpose_tpu.compat import blazeFaceDetector
    detector = blazeFaceDetector()
    results = detector.detectFaces(frame)   # .boxes .keypoints .scores .poses
    frame = detector.drawDetections(frame, results)

New code should use headpose_tpu.runtime.FaceDetector directly (batched,
explicit, jit-friendly).
"""
from __future__ import annotations

import os

from .runtime.results import Results
from .utils.profiling import FpsCounter

__all__ = ["blazeFaceDetector", "Results", "KEY_POINT_SIZE", "MAX_FACE_NUM",
           "INPUT_FRONT", "INPUT_BACK"]

# reference constants (blazeFaceDetectorH5.py:8-11)
KEY_POINT_SIZE = 6
MAX_FACE_NUM = 100
INPUT_FRONT = 128
INPUT_BACK = 256


class blazeFaceDetector:  # noqa: N801 — reference-compatible name
    """Reference-shaped detector facade over runtime.FaceDetector."""

    def __init__(self, scoreThreshold: float = 0.4, iouThreshold: float = 0.3,
                 model_path: str | None = None):
        from .runtime.detector import FaceDetector

        self.scoreThreshold = scoreThreshold
        self.iouThreshold = iouThreshold
        if model_path is None:
            from .pretrained import flagship_detector

            self._detector = flagship_detector(
                score_threshold=scoreThreshold, iou_threshold=iouThreshold)
        else:
            loader = (FaceDetector.from_native if os.path.isdir(model_path)
                      else FaceDetector.from_h5)
            self._detector = loader(model_path, score_threshold=scoreThreshold,
                                    iou_threshold=iouThreshold)
        self._fps = FpsCounter()
        self.fps = 0

    def detectFaces(self, image) -> Results:
        results = self._detector.detect_single(image)
        self.fps = int(self._fps.tick())
        return results

    def drawDetections(self, img, results: Results):
        from .runtime.viz import draw_detections

        return draw_detections(img, results, fps=self.fps)

