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
           "INPUT_FRONT", "INPUT_BACK",
           "EMAFilter", "SsdAnchorsCalculatorOptions", "Anchor", "gen_anchors"]

# reference constants (blazeFaceDetectorH5.py:8-11)
KEY_POINT_SIZE = 6
MAX_FACE_NUM = 100
INPUT_FRONT = 128
INPUT_BACK = 256


class EMAFilter:
    """Signature-compatible scalar smoother (the reference demo's filter,
    blazeFaceDetectorH5.py:16-35), implemented as a thin host-side view of
    runtime.smoothing's seeding EMA semantics: the first update seeds the
    state, later updates blend with weight ``alpha`` on the new sample.  New
    code should use runtime.smoothing.TrackSmoother (vectorized, per-slot)."""

    def __init__(self, alpha: float, initial_value: float = 0.0):
        if not 0.0 < alpha <= 1.0:
            raise ValueError(f"EMA weight must lie in (0, 1]; got {alpha}")
        self.alpha = float(alpha)
        self.state = initial_value
        self.initialized = False

    def update(self, measurement: float) -> float:
        # same recurrence (and floating-point form) as
        # runtime.smoothing.ema_update: seed on the first sample, then
        # y = alpha*x + (1-alpha)*y
        if self.initialized:
            self.state = (self.alpha * measurement
                          + (1.0 - self.alpha) * self.state)
        else:
            self.state, self.initialized = measurement, True
        return self.state


class SsdAnchorsCalculatorOptions:
    """Anchor-generation options with the reference's constructor signature
    (blazeFaceUtils.py:3-48), backed by models.anchors.AnchorConfig."""

    def __init__(self, input_size_width, input_size_height, min_scale,
                 max_scale, num_layers, feature_map_width, feature_map_height,
                 strides, aspect_ratios, anchor_offset_x=0.5,
                 anchor_offset_y=0.5, reduce_boxes_in_lowest_layer=False,
                 interpolated_scale_aspect_ratio=1.0, fixed_anchor_size=False):
        from .models.anchors import AnchorConfig

        if list(feature_map_width) or list(feature_map_height):
            raise NotImplementedError(
                "explicit feature_map sizes are unused by the reference "
                "configs; stride-derived grids only")
        self.config = AnchorConfig(
            input_width=input_size_width, input_height=input_size_height,
            min_scale=min_scale, max_scale=max_scale, strides=tuple(strides),
            aspect_ratios=tuple(aspect_ratios),
            anchor_offset_x=anchor_offset_x, anchor_offset_y=anchor_offset_y,
            interpolated_scale_aspect_ratio=interpolated_scale_aspect_ratio,
            fixed_anchor_size=fixed_anchor_size,
            reduce_boxes_in_lowest_layer=reduce_boxes_in_lowest_layer)
        if num_layers != len(self.config.strides):
            raise ValueError("num_layers must equal len(strides)")


class Anchor:
    """Anchor record with the reference's field names (blazeFaceUtils.py:50-57)."""

    def __init__(self, x_center, y_center, h, w):
        self.x_center, self.y_center, self.h, self.w = x_center, y_center, h, w

    def to_string(self):
        return (f"x_center: {self.x_center}, y_center: {self.y_center}, "
                f"h: {self.h}, w: {self.w}")


def gen_anchors(options: SsdAnchorsCalculatorOptions) -> list[Anchor]:
    """Reference-shaped anchor generation (blazeFaceUtils.py:59-127) on top of
    the vectorized table."""
    from .models.anchors import generate_anchors

    table = generate_anchors(options.config)
    return [Anchor(x, y, h, w) for x, y, w, h in table]


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

