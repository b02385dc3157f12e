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

import numpy as np

__all__ = ["FpsCounter", "Timer", "trace", "staged_uint8_frames",
           "sustained_seconds_per_dispatch"]


def staged_uint8_frames(batch: int, size: int = 128, n_buffers: int = 8,
                        seed: int = 0) -> list:
    """Stage `n_buffers` distinct random uint8 frame batches on device.

    The ONE benchmarking input recipe (docs/BENCH.md methodology): distinct
    buffers cycled through the loop rule out same-input dispatch elision by
    this container's runtime, and staging via device_put keeps the ~0.5 s /
    12 MB tunnel transfer out of the timed loop."""
    import jax

    rng = np.random.default_rng(seed)
    return [jax.device_put(rng.integers(0, 256, size=(batch, size, size, 3),
                                        dtype=np.int64).astype(np.uint8))
            for _ in range(n_buffers)]


def sustained_seconds_per_dispatch(fn, inputs: list, iters: int = 500) -> float:
    """Sustained-throughput timing of `fn` over cycled staged inputs.

    THE methodology every benchmark/probe in this repo must share
    (docs/BENCH.md): one warmup dispatch (triggers compile), then `iters`
    back-to-back dispatches cycling the staged buffers with a single
    block_until_ready at the end — results stay on device between
    iterations, as in serving.  500 iterations measures the sustained rate
    (50-iteration loops under-report by ~25% while the dispatch pipeline
    and chip clocks ramp).  Returns seconds per dispatch."""
    import jax

    jax.block_until_ready(fn(inputs[0]))
    n = len(inputs)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % n])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


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
