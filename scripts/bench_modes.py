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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="turbo,fast,highest")
    ap.add_argument("--batches", default="64,128,256")
    ap.add_argument("--iters", type=int, default=500)
    args = ap.parse_args()

    import jax
    import __graft_entry__ as ge
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    print("devices:", jax.devices(), flush=True)
    for mode in args.modes.split(","):
        fn, (params, _) = ge.entry(precision=mode)
        fn = jax.jit(fn)
        for batch in (int(b) for b in args.batches.split(",")):
            bufs = staged_uint8_frames(batch)
            sec = sustained_seconds_per_dispatch(
                lambda b: fn(params, b), bufs, args.iters)
            print(f"{mode:8s} batch {batch:4d}: {sec*1e3:7.3f} ms "
                  f"{batch/sec:9.0f} frames/sec", flush=True)


if __name__ == "__main__":
    main()
