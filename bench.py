"""Benchmark: end-to-end detection+pose throughput on the flagship model.

Measures the fused image→detections pipeline (preprocess → BlazeFace backbone
+ SSD + pose heads → decode → NMS → pose gather, ONE XLA program) on whatever
accelerator jax selects (the driver runs this on a real TPU chip).

Baseline (BASELINE.md): the reference processes 20.6 faces/sec — batch-1
forward of the same unified model, 48.6 ms/frame on the container CPU, and it
cannot batch at all (input hardwired [1,128,128,3]).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_FACES_PER_SEC = 20.6  # BASELINE.md, measured reference CPU throughput


def main() -> None:
    import jax

    import __graft_entry__ as ge

    # 'fast' serving mode: dense-composed 3x3 convs at 3-pass 'high'
    # precision — the fastest mode that holds the 0.1-degree reference-
    # parity budget on the 112-image certification corpus (pose error
    # p99 0.0039 / max 0.0064 deg, identical detection sets;
    # docs/certification.json).  Round 2 benched 'turbo' here on a
    # 3-image 0.07-deg claim; the corpus showed turbo's true p99 is
    # 0.22 deg, so the headline is now the honestly-certified mode.
    fn, (params, _) = ge.entry(precision="fast")
    fn = jax.jit(fn)

    # batch 128 is the measured sweet spot: batches 64-128 cost near-equal
    # wall time (~1.3 ms, dispatch-latency-bound) and >128 crosses a ~2x
    # step (docs/BENCH.md batch sweep)
    batch = 128
    rng = np.random.default_rng(0)
    # 8 distinct staged buffers cycled through the loop — rules out any
    # same-input dispatch elision by the runtime (verified to agree with
    # same-input timing, docs/BENCH.md methodology).  Staged on device: a
    # serving stack overlaps transfers with compute; through this
    # container's TPU tunnel a sync in-dispatch transfer costs ~0.7s and
    # would measure the tunnel, not the program.
    bufs = [jax.device_put(rng.integers(0, 256, size=(batch, 128, 128, 3),
                                        dtype=np.int64).astype(np.uint8))
            for _ in range(8)]

    # compile + warmup
    out = fn(params, bufs[0])
    jax.block_until_ready(out)

    # 500 iterations measures SUSTAINED serving throughput: short (50-iter)
    # loops under-report by ~25% while the dispatch pipeline and chip
    # clocks ramp (measured: 50 iters -> 72-75k, 500 -> 97k at batch 128)
    iters = 500
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(params, bufs[i % 8])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    frames_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "end-to-end detect+pose throughput",
        "value": round(frames_per_sec, 1),
        "unit": "frames/sec/chip (batch 128 uint8 128x128 frames on-device, NMS'd results out, sustained 500-dispatch loop, fast mode: corpus-certified pose err p99 0.0039deg / max 0.0064deg vs reference, identical detection sets)",
        "vs_baseline": round(frames_per_sec / BASELINE_FACES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
