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
           "EMAFilter", "SsdAnchorsCalculatorOptions", "Anchor", "gen_anchors",
           "EulerToMatrix", "drawAxis_simo"]

# Not mirrored: the reference class's PRIVATE pipeline stages
# (prepareInputForInference / inference / extractDetections /
# filterDetections / filterWithNonMaxSupression, :247-357) — they are
# implementation details its own detectFaces composes, replaced here by the
# fused on-device pipeline (runtime.detector); detectFaces output parity is
# golden-tested instead (tests/test_detection.py).

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
        from .pretrained import resolve_model_path

        model_path = resolve_model_path(model_path)
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
        # the reference __init__ establishes these instance attributes via
        # initializeModel() (blazeFaceDetectorH5.py:82-107) — drop-in call
        # sites read detector.anchors / inputWidth / sigmoidScoreThreshold
        import numpy as np

        self.sigmoidScoreThreshold = float(
            np.log(scoreThreshold / (1.0 - scoreThreshold))
            if 0.0 < scoreThreshold < 1.0
            else (-np.inf if scoreThreshold <= 0.0 else np.inf))
        self.getModelInputDetails()
        self.generateAnchors()

    def detectFaces(self, image) -> Results:
        results = self._detector.detect_single(image)
        self.fps = int(self._fps.tick())
        return results

    def drawDetections(self, img, results: Results):
        from .runtime.viz import draw_detections

        return draw_detections(img, results, fps=self.fps)

    def updateFps(self) -> int:
        """Reference method (blazeFaceDetectorH5.py:128-139).  detectFaces
        already ticks the counter per call, so loops that additionally call
        updateFps() count the extra tick — same drift the reference has
        when both paths run."""
        self.fps = int(self._fps.tick())
        return self.fps

    def getModelInputDetails(self):
        """Reference method (:221-229): records the expected input geometry
        on the instance."""
        self.inputHeight = self._detector.input_size
        self.inputWidth = self._detector.input_size
        self.channels = 3

    def generateAnchors(self):
        """Reference method (:233-246): (re)build the anchor table on the
        instance — the detector already holds the same table; this exposes
        it under the reference's attribute name."""
        import numpy as np

        self.anchors = [Anchor(x, y, h, w) for x, y, w, h in
                        np.asarray(self._detector.anchors)]
        return self.anchors

    def draw_axis(self, img, yaw, pitch, roll, tdx, tdy, size=50,
                  thickness=2):
        """The reference's simple 2D-arrow overlay (:142-173): yaw arrow
        red, pitch green, roll blue — a flat-plane variant distinct from
        drawAxis_simo's rotation-matrix projection."""
        import math

        cv2 = _require_cv2()
        cx, cy = int(tdx), int(tdy)
        yr, pr, rr = (-math.radians(yaw), math.radians(pitch),
                      math.radians(roll))
        cv2.line(img, (cx, cy),
                 (int(cx + size * math.sin(yr)),
                  int(cy - size * math.cos(yr))), (0, 0, 255), thickness)
        cv2.line(img, (cx, cy),
                 (cx, int(cy - size * math.sin(pr))), (0, 255, 0), thickness)
        cv2.line(img, (cx, cy),
                 (int(cx + size * math.cos(rr)),
                  int(cy + size * math.sin(rr))), (255, 0, 0), thickness)
        return img


def EulerToMatrix(roll, yaw, pitch):
    """Reference module function (blazeFaceDetectorH5.py:40-62): rotation
    matrix R = Rx @ Ry @ Rz from degrees — identical math to
    utils.geometry.euler_to_matrix (same argument order)."""
    from .utils.geometry import euler_to_matrix

    return euler_to_matrix(roll, yaw, pitch)


def drawAxis_simo(img, headpose, tdx, tdy, size=100):
    """Reference module function (:64-77): 3D axis overlay from headpose =
    (roll, yaw, pitch); delegates to utils.geometry.pose_axes (same negated-
    angle projection and endpoint math, verified by test_geometry)."""
    from .utils.geometry import pose_axes

    cv2 = _require_cv2()
    roll, yaw, pitch = headpose[0], headpose[1], headpose[2]
    axes = pose_axes(yaw, pitch, roll, tdx, tdy, size)
    o = (int(tdx), int(tdy))
    cv2.line(img, o, (int(axes["x"][0]), int(axes["x"][1])), (0, 255, 0), 3)
    cv2.line(img, o, (int(axes["y"][0]), int(axes["y"][1])), (0, 0, 255), 3)
    cv2.line(img, o, (int(axes["z"][0]), int(axes["z"][1])), (255, 0, 0), 2)
    return img


def _require_cv2():
    from .runtime.viz import _require_cv2 as req

    return req()

