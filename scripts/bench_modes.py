"""Sustained-throughput matrix: serving precision modes x batch sizes.

The measurement methodology behind docs/BENCH.md (and bench.py's choice of
batch 128 / 500 dispatches): cycle 8 distinct device-staged input buffers
through a long dispatch loop with ONE block_until_ready at the end.  Short
(50-iter) loops under-report sustained throughput by ~25% in this container
while the dispatch pipeline and chip clocks ramp; same-input and
varied-input loops agree within 2% on this program (no dispatch elision),
see CLAUDE.md "Benchmarking gotcha".

Run on the TPU:  PYTHONPATH=/root/repo python scripts/bench_modes.py
  [--modes turbo,fast,highest] [--batches 64,128,256] [--iters 500]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="turbo,fast,highest")
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=500)
    args = ap.parse_args()

    import jax
    import __graft_entry__ as ge

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for mode in args.modes.split(","):
        fn, (params, _) = ge.entry(precision=mode)
        fn = jax.jit(fn)
        for batch in (int(b) for b in args.batches.split(",")):
            bufs = [jax.device_put(rng.integers(
                0, 256, size=(batch, 128, 128, 3),
                dtype=np.int64).astype(np.uint8)) for _ in range(8)]
            out = fn(params, bufs[0])
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = fn(params, bufs[i % 8])
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            print(f"{mode:8s} batch {batch:4d}: {dt/args.iters*1e3:7.3f} ms "
                  f"{batch*args.iters/dt:9.0f} frames/sec", flush=True)


if __name__ == "__main__":
    main()
