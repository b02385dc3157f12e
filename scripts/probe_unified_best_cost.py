"""Paired on-chip A/B: serving cost of `unified-best` (both stacked-mixed
ensemble pose heads, 99 members total) vs the single-head flagship.

Methodology note (late round 3): the chip's absolute throughput DRIFTS by up
to ~40% across minutes in this container (the same compiled flagship program
measured 88k and 54k f/s half an hour apart; within one sequential sweep the
rate visibly rose mid-run, making added-work variants come out "faster" than
their baseline).  Sequential variant sweeps (probe_ensemble_cost.py) are
therefore only comparable within a stable window — this probe instead
INTERLEAVES the two programs round-robin and reports the per-round paired
time ratio, which cancels the drift.  Measured history:

  sequential member apply (stable window): 4.344 vs 1.454 ms -> 2.99x
  grouped-member apply (EnsembleHead._apply_grouped, identical specs
  batched into one vmapped program each): median paired ratio 1.87x in a
  stable window (cross-run medians 1.70-2.27 as the chip state drifted)

Usage:  python scripts/probe_unified_best_cost.py [iters] [rounds]
Writes docs/unified_best_cost.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "unified_best_cost.json")


def main():
    import jax

    from headpose_tpu.pretrained import load_flagship, load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch = 128

    fns, compile_s = {}, {}
    bufs = staged_uint8_frames(batch)
    jax.block_until_ready(bufs)
    for tag, (m, p) in (("flagship", load_flagship()),
                        ("unified-best", load_pretrained("unified-best"))):
        det = FaceDetector(m, p, precision="fast", postprocess="xla")
        args = (det.params, det.score_threshold, det.iou_threshold,
                det.max_faces, det.precision, det.postprocess)

        def run(images, det=det, args=args):
            return det._pipeline(args[0], images, *args[1:])

        t0 = time.time()
        jax.block_until_ready(jax.tree.leaves(run(bufs[0])))
        compile_s[tag] = round(time.time() - t0, 1)
        fns[tag] = run
        print(f"{tag}: compiled in {compile_s[tag]} s", flush=True)

    ms = {t: [] for t in fns}
    for r in range(rounds):
        for t, f in fns.items():
            ms[t].append(sustained_seconds_per_dispatch(f, bufs, iters) * 1e3)
        print(f"round {r}: " + "  ".join(f"{t}={ms[t][-1]:.3f}ms"
                                         for t in ms), flush=True)

    ratios = [b / a for a, b in zip(ms["flagship"], ms["unified-best"])]
    report = {
        "iters": iters, "rounds": rounds, "batch": batch,
        "methodology": "interleaved paired rounds; the ratio cancels the "
                       "container's chip-rate drift (see module docstring)",
        "flagship_ms": [round(x, 3) for x in ms["flagship"]],
        "unified_best_ms": [round(x, 3) for x in ms["unified-best"]],
        "paired_time_ratios": [round(x, 3) for x in ratios],
        "median_time_ratio": round(statistics.median(ratios), 3),
        "median_flagship_fps": round(
            batch / (statistics.median(ms["flagship"]) / 1e3), 1),
        "median_unified_best_fps": round(
            batch / (statistics.median(ms["unified-best"]) / 1e3), 1),
        "compile_s": compile_s,
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"median paired ratio {report['median_time_ratio']}x; wrote {OUT}",
          flush=True)


if __name__ == "__main__":
    main()
