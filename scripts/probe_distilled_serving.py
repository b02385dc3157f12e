"""Paired on-chip A/B: serving profiles of `unified-best-distilled`.

The distilled frontier costs a paired-median ~1.11x flagship dispatch in
map profile (docs/unified_best_cost.json) — the residual being the two
256-128 MLP heads evaluated over all 320 map cells.  Because the heads are
plain per-vector MLPs, head_eval='survivors' computes the IDENTICAL
function on <= max_faces gathered rows instead, so the head work shrinks
20x at max_faces=16 while two one-hot gather GEMMs are added.  This probe
measures whether that trade pays, with the same interleaved paired-ratio
methodology as probe_unified_best_cost.py (chip drift up to ~40%/minutes).

Usage:  python scripts/probe_distilled_serving.py [iters] [rounds]
Writes docs/distilled_serving_cost.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "distilled_serving_cost.json")


def main():
    import jax

    from headpose_tpu.pretrained import load_flagship, load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500  # r5: 500-iter arms turn 20-35% "drift" windows into 1-2% ones
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    batch = 128

    flag = load_flagship()
    dist = load_pretrained("unified-best-distilled")
    variants = {
        "flagship-map": (flag, "map", 100),
        "distilled-map": (dist, "map", 100),
        "distilled-surv": (dist, "survivors", 100),
        "distilled-surv16": (dist, "survivors", 16),
    }

    fns, compile_s = {}, {}
    bufs = staged_uint8_frames(batch)
    jax.block_until_ready(bufs)
    for tag, ((m, p), head_eval, max_faces) in variants.items():
        det = FaceDetector(m, p, precision="fast", postprocess="xla",
                           head_eval=head_eval, max_faces=max_faces)
        args = (det.params, det.score_threshold, det.iou_threshold,
                det.max_faces, det.precision, det.postprocess,
                det.turbo_island, det.head_eval)

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

    fm = ms["flagship-map"]
    spread = (max(fm) - min(fm)) / statistics.median(fm)
    # the surv/surv16-vs-map question is a DIRECT A/B on the same artifact:
    # pair each variant against its own same-round distilled-map dispatch
    # (adjacent, ~1 s apart) — far tighter than flagship normalization on
    # drift days (methodology: probe_survivors_cost.py; A/A-validated in
    # docs/survivors_cost.json `direct_pairing_aa`)
    direct = {}
    for tag in ("distilled-surv", "distilled-surv16"):
        rs = [b / a for a, b in zip(ms["distilled-map"], ms[tag])]
        direct[tag] = {
            "vs": "distilled-map",
            "per_round": [round(x, 3) for x in rs],
            "median": round(statistics.median(rs), 3),
            "spread": round((max(rs) - min(rs)) / statistics.median(rs), 3),
        }
    report = {
        "iters": iters, "rounds": rounds, "batch": batch,
        "flagship_round_spread": round(spread, 3),
        "stable_window": spread < 0.05,
        "ms": {t: [round(x, 3) for x in v] for t, v in ms.items()},
        "median_ratio_vs_flagship_map": {
            t: round(statistics.median(
                [b / a for a, b in zip(fm, ms[t])]), 3) for t in fns},
        "direct_pairing": direct,
        "median_fps": {t: round(batch / (statistics.median(v) / 1e3), 1)
                       for t, v in ms.items()},
        "compile_s": compile_s,
    }
    # every run's summary is accumulated in `history` (and an unstable run
    # never replaces a stable top-level record) — drift-day attempts are
    # evidence of the hunt for a <5% window, not disposable
    old = None
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                old = json.load(f)
        except (json.JSONDecodeError, OSError):
            old = None
    history = (old or {}).get("history", [])
    history.append({
        "rounds": rounds, "iters": iters,
        "flagship_round_spread": report["flagship_round_spread"],
        "stable_window": report["stable_window"],
        "median_ratio_vs_flagship_map":
            report["median_ratio_vs_flagship_map"],
        "direct_pairing_medians": {t: d["median"]
                                   for t, d in direct.items()},
        "direct_pairing_spreads": {t: d["spread"]
                                   for t, d in direct.items()},
    })
    if old and old.get("stable_window") and not report["stable_window"]:
        old["history"] = history
        out_doc = old
    else:
        report["history"] = history
        out_doc = report
    with open(OUT, "w") as f:
        json.dump(out_doc, f, indent=1)
    print(json.dumps(report["median_ratio_vs_flagship_map"]), flush=True)
    print(f"flagship spread {spread:.1%} -> "
          f"{'STABLE' if report['stable_window'] else 'UNSTABLE'} window; "
          f"wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
