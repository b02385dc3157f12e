"""Lightweight tracing / profiling.

The reference's only observability is a frame-rate counter drawn on screen
(blazeFaceDetectorH5.py:128-139).  Provided here: the same FPS counter, a
generic section timer, and a context manager around jax.profiler for real
TPU traces (view with TensorBoard / xprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

__all__ = ["FpsCounter", "Timer", "trace"]


class FpsCounter:
    """Frames-per-second over a sliding update window (updateFps parity)."""

    def __init__(self, update_every: int = 1):
        self.update_every = update_every
        self._count = 0
        self._last = time.time()
        self.fps = 0.0

    def tick(self) -> float:
        self._count += 1
        if self._count >= self.update_every:
            now = time.time()
            self.fps = self._count / (now - self._last + 1e-4)
            self._count = 0
            self._last = now
        return self.fps


class Timer:
    """Accumulating section timer: with t.section('decode'): ..."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/headpose_tpu_trace"):
    """Capture a device trace via jax.profiler (open in TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
