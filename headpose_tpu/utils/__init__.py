"""Utilities: pose geometry, profiling/tracing."""
from .geometry import euler_to_matrix, pose_axes
from .profiling import FpsCounter, Timer, trace

__all__ = ["euler_to_matrix", "pose_axes", "FpsCounter", "Timer", "trace"]
