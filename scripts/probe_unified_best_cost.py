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

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500  # r5: 500-iter arms turn 20-35% "drift" windows into 1-2% ones
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch = 128

    fns, compile_s = {}, {}
    bufs = staged_uint8_frames(batch)
    jax.block_until_ready(bufs)
    variants = [("flagship", load_flagship()),
                ("unified-best", load_pretrained("unified-best"))]
    try:  # the distilled frontier serves the stacks' function as plain
        # MLP heads — the paired ratio here is the r4 "accuracy at
        # flagship cost" claim (scripts/build_unified_best_distilled.py)
        variants.append(("unified-best-distilled",
                         load_pretrained("unified-best-distilled")))
    except FileNotFoundError:
        pass
    for tag, (m, p) in variants:
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

    fm = ms["flagship"]
    spread = (max(fm) - min(fm)) / statistics.median(fm)
    report = {
        "iters": iters, "rounds": rounds, "batch": batch,
        "methodology": "interleaved paired rounds; the ratio cancels the "
                       "container's chip-rate drift (see module docstring)",
        "flagship_round_spread": round(spread, 3),
        "stable_window": spread < 0.05,
        "ms": {t: [round(x, 3) for x in v] for t, v in ms.items()},
        "median_time_ratio_vs_flagship": {
            t: round(statistics.median(
                [b / a for a, b in zip(fm, ms[t])]), 3)
            for t in fns if t != "flagship"},
        "median_fps": {t: round(batch / (statistics.median(v) / 1e3), 1)
                       for t, v in ms.items()},
        "compile_s": compile_s,
    }
    # keep the r3 field names readable by older docs/tests
    report["median_time_ratio"] = report[
        "median_time_ratio_vs_flagship"]["unified-best"]
    # an UNSTABLE run never replaces a stable top-level record (the 1.115x
    # headline is stable-window-backed); every run lands in `history` so
    # per-round re-measures are on the record either way (A/A control:
    # many-round medians center within ~5% even on drift days —
    # docs/survivors_cost.json direct_pairing_aa)
    old = None
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                old = json.load(f)
        except (json.JSONDecodeError, OSError):
            old = None
    entry = {"rounds": rounds, "iters": iters,
             "flagship_round_spread": report["flagship_round_spread"],
             "stable_window": report["stable_window"],
             "median_time_ratio_vs_flagship":
                 report["median_time_ratio_vs_flagship"]}
    history = (old or {}).get("history", [])
    history.append(entry)
    if old and old.get("stable_window") and not report["stable_window"]:
        old["history"] = history
        out_doc, kept = old, True
    else:
        report["history"] = history
        out_doc, kept = report, False
    with open(OUT, "w") as f:
        json.dump(out_doc, f, indent=1)
    status = ("UNSTABLE window — kept the stable top-level record, "
              "appended to history" if kept else "top-level updated")
    print(f"median paired ratio "
          f"{report['median_time_ratio_vs_flagship']} ({status}); "
          f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
