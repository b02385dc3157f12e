"""Streaming detection: overlap host→device transfer with device compute.

jax dispatch is asynchronous: `device_put` of batch k+1 can be in flight while
the detect program for batch k runs.  This wrapper keeps a small prefetch
queue of staged batches so a host-fed stream (video decoder, RPC queue)
sustains near device-resident throughput instead of serializing
transfer→compute→transfer (which through this container's TPU tunnel is
catastrophic — see docs/BENCH.md methodology).
"""
from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator

import jax

from .detector import FaceDetector
from .results import BatchResults

__all__ = ["detect_stream"]


def detect_stream(detector: FaceDetector, batches: Iterable,
                  prefetch: int = 2) -> Iterator[BatchResults]:
    """Yield BatchResults for an iterable of (B, H, W, 3) frame batches.

    Batches are staged onto the device `prefetch` ahead of the compute that
    consumes them; results are yielded in order.  All batches should share one
    shape (one compiled program)."""
    staged: deque = deque()
    it = iter(batches)

    def stage_next() -> bool:
        try:
            staged.append(jax.device_put(next(it)))
            return True
        except StopIteration:
            return False

    depth = max(prefetch, 1)
    for _ in range(depth):
        if not stage_next():
            break

    pending: deque = deque()
    while staged or pending:
        # keep at most `depth` dispatches in flight, then yield the oldest —
        # bounded memory and incremental results even for unbounded streams
        while staged and len(pending) < depth:
            pending.append(detector.detect(staged.popleft()))
            stage_next()
        yield pending.popleft()
