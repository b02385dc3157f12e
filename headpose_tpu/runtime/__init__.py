"""Detection runtime: fused detect pipeline, results, temporal smoothing."""
from .detector import FaceDetector
from .results import Results, BatchResults
from .server import DynamicBatcher
from .smoothing import EmaState, ema_init, ema_update, smooth_sequence, TrackSmoother
from .streaming import detect_stream
from .tracking import IoUTrackSmoother, TrackState, tracks_init, tracks_update
from .viz import draw_detections

__all__ = [
    "FaceDetector", "Results", "BatchResults",
    "EmaState", "ema_init", "ema_update", "smooth_sequence", "TrackSmoother",
    "IoUTrackSmoother", "TrackState", "tracks_init", "tracks_update",
    "draw_detections", "detect_stream", "DynamicBatcher",
]
