"""Paired on-chip A/B: survivors-only head evaluation vs map-mode serving.

head_eval='survivors' (runtime.detector) runs the pose heads AFTER NMS on the
feature vectors gathered at the survivor cells (≤ max_faces rows) instead of
over every map cell (256 + 64 cells).  For unified-best's 99-member stacked
heads that trades ~18 grouped dot chains over the full maps for the same
chains over a (B, max_faces) slab plus two one-hot gather GEMMs; for the
flagship's tiny heads it mostly adds the gathers.

Variants (all batch 128, 'fast' mode, XLA postprocess), interleaved
round-robin with per-round PAIRED ratios against the same-round flagship-map
dispatch (the chip's absolute rate drifts up to ~40% across minutes in this
container — see probe_unified_best_cost.py):

  flagship-map        the headline serving config (baseline of every ratio)
  flagship-surv       survivors profile on the flagship (expected ~neutral)
  best-map            unified-best, map profile (1.87x in the r3 probe)
  best-surv           unified-best, survivors, max_faces=100
  best-surv16         unified-best, survivors, max_faces=16 (small-slab
                      serving profile; the Results slab shrinks to 16)

Usage:  python scripts/probe_survivors_cost.py [iters] [rounds]
        python scripts/probe_survivors_cost.py --aa [iters] [rounds]
Writes docs/survivors_cost.json.

--aa (VERDICT r4 item 3) validates the DIRECT-PAIRING estimator itself:
the same compiled flagship program is dispatched as BOTH arms of each
round (adjacent sustained loops ~1 s apart — exactly the cadence the
direct pairing uses for its A and B programs), so the per-round B/A ratio
distribution measures the estimator's bias/noise floor.  Unbiased =
centered at 1.00; the spread bounds how small a real A/B effect the
method can resolve.  Writes a `direct_pairing_aa` section (merged, never
clobbering the main report).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "survivors_cost.json")


def aa_main():
    import jax

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    argv = [a for a in sys.argv[1:] if a != "--aa"]
    iters = int(argv[0]) if len(argv) > 0 else 500
    rounds = int(argv[1]) if len(argv) > 1 else 9
    batch = 128

    m, p = load_flagship()
    det = FaceDetector(m, p, precision="fast", postprocess="xla")
    args = (det.params, det.score_threshold, det.iou_threshold,
            det.max_faces, det.precision, det.postprocess,
            det.turbo_island, det.head_eval)

    def run(images):
        return det._pipeline(args[0], images, *args[1:])

    bufs = staged_uint8_frames(batch)
    jax.block_until_ready(bufs)
    t0 = time.time()
    jax.block_until_ready(jax.tree.leaves(run(bufs[0])))
    print(f"compiled in {time.time() - t0:.1f} s", flush=True)

    a_ms, b_ms = [], []
    for r in range(rounds):
        a_ms.append(sustained_seconds_per_dispatch(run, bufs, iters) * 1e3)
        b_ms.append(sustained_seconds_per_dispatch(run, bufs, iters) * 1e3)
        print(f"round {r}: A={a_ms[-1]:.3f}ms  B={b_ms[-1]:.3f}ms  "
              f"B/A={b_ms[-1] / a_ms[-1]:.4f}", flush=True)

    ratios = [b / a for a, b in zip(a_ms, b_ms)]
    med = statistics.median(ratios)
    window = (max(a_ms) - min(a_ms)) / statistics.median(a_ms)
    section = {
        "what": "A/A control of the direct-pairing estimator: the SAME "
                "compiled flagship program as both arms of every round "
                "(adjacent sustained loops, the pairing cadence); an "
                "unbiased estimator centers at 1.00",
        "iters": iters, "rounds": rounds, "batch": batch,
        "a_ms": [round(x, 3) for x in a_ms],
        "b_ms": [round(x, 3) for x in b_ms],
        "per_round_ratio": [round(x, 4) for x in ratios],
        "median_ratio": round(med, 4),
        "mean_ratio": round(statistics.fmean(ratios), 4),
        "spread": round((max(ratios) - min(ratios)) / med, 4),
        "window_drift_across_rounds": round(window, 3),
        "unbiased_within_2pct": abs(med - 1.0) < 0.02,
    }
    report = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                report = json.load(f)
        except (json.JSONDecodeError, OSError):
            pass
    # accumulate sessions: drift-day and calm-day windows are BOTH evidence
    # (the estimator's resolution is window-dependent; BENCH.md methodology)
    aa = report.get("direct_pairing_aa", {})
    sessions = aa.get("sessions", [])
    if "median_ratio" in aa:   # migrate a pre-sessions single record
        sessions.append({k: v for k, v in aa.items() if k != "sessions"})
    sessions.append(section)
    report["direct_pairing_aa"] = {
        "what": section["what"],
        "sessions": sessions,
        "conclusion": (
            "median over >=7 rounds centers within ~5% of 1.00 in every "
            "window; single-round ratios resolve only ~ +/-(window drift)/4 "
            "— direct pairing is unbiased at the median but its resolution "
            "degrades with the window's drift (see per-session spread)"),
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print(f"A/A median {med:.4f} (mean {section['mean_ratio']:.4f}), "
          f"ratio spread {section['spread']:.1%}, window drift "
          f"{window:.1%} -> "
          f"{'UNBIASED' if section['unbiased_within_2pct'] else 'BIASED'}; "
          f"wrote {OUT}", flush=True)


def main():
    import jax

    from headpose_tpu.pretrained import load_flagship, load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500  # r5: 500-iter arms turn 20-35% "drift" windows into 1-2% ones
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch = 128

    flag = load_flagship()
    best = load_pretrained("unified-best")
    variants = {
        "flagship-map": (flag, "map", 100),
        "flagship-surv": (flag, "survivors", 100),
        "best-map": (best, "map", 100),
        "best-surv": (best, "survivors", 100),
        "best-surv16": (best, "survivors", 16),
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

    def paired(tag):
        return [b / a for a, b in zip(ms["flagship-map"], ms[tag])]

    # stability self-assessment: the chip's drift exposure is
    # program-dependent (CLAUDE.md) — the flagship's round-to-round spread
    # is the window-stability probe.  Only stable-window runs are
    # comparison-grade; an unstable run refuses to overwrite a stable one.
    fm = ms["flagship-map"]
    spread = (max(fm) - min(fm)) / statistics.median(fm)
    stable = spread < 0.05
    # the survivors-vs-map question is a DIRECT A/B on the same artifact:
    # pair each variant against its OWN same-round map baseline, which
    # cancels chip drift far more tightly than flagship-normalization
    # (the two dispatches are ~1 s apart instead of a whole round)
    direct = {}
    for tag, base in (("flagship-surv", "flagship-map"),
                      ("best-surv", "best-map"),
                      ("best-surv16", "best-map")):
        rs = [b / a for a, b in zip(ms[base], ms[tag])]
        direct[tag] = {
            "vs": base,
            "per_round": [round(x, 3) for x in rs],
            "median": round(statistics.median(rs), 3),
            "spread": round((max(rs) - min(rs)) / statistics.median(rs), 3),
        }
    report = {
        "iters": iters, "rounds": rounds, "batch": batch,
        "methodology": "interleaved rounds; per-round PAIRED time ratios vs "
                       "the same-round flagship-map dispatch cancel the "
                       "container's chip-rate drift; the survivors-vs-map "
                       "claim itself uses the DIRECT same-round pairing "
                       "below (same artifact, adjacent dispatches)",
        "flagship_round_spread": round(spread, 3),
        "stable_window": stable,
        "ms": {t: [round(x, 3) for x in v] for t, v in ms.items()},
        "median_ratio_vs_flagship_map": {
            t: round(statistics.median(paired(t)), 3) for t in fns},
        "direct_pairing": direct,
        "median_fps": {t: round(batch / (statistics.median(v) / 1e3), 1)
                       for t, v in ms.items()},
        "compile_s": compile_s,
    }
    keep = True
    old = None
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                old = json.load(f)
        except (json.JSONDecodeError, OSError):
            old = None
    if old and "direct_pairing_aa" in old:
        # the A/A control section is maintained by --aa runs; a fresh A/B
        # run must carry it forward, not clobber it
        report["direct_pairing_aa"] = old["direct_pairing_aa"]
    if not stable and old is not None:
        # an unstable run never replaces a stable one; among unstable
        # runs, one that carries the direct same-round pairing beats
        # one that doesn't, then the tighter flagship window wins
        keep = (not old.get("stable_window", False)
                and ("direct_pairing" not in old
                     or spread < old.get("flagship_round_spread",
                                         float("inf"))))
    if keep:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    print(json.dumps(report["median_ratio_vs_flagship_map"]), flush=True)
    print(f"flagship spread {spread:.1%} -> "
          f"{'STABLE window' if stable else 'UNSTABLE window'}; "
          f"{'wrote' if keep else 'kept existing (tighter) run, did NOT write'} "
          f"{OUT}", flush=True)


if __name__ == "__main__":
    if "--aa" in sys.argv:
        aa_main()
    else:
        main()
