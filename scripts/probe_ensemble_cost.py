"""On-chip A/B: serving cost of ensemble pose heads vs the single-head
flagship, measured as FULL-PIPELINE variants (the one trustworthy timing
methodology here — see CLAUDE.md benchmarking gotchas and
utils/profiling.py).

EnsembleHead's pitch is that K few-thousand-param heads add ~nothing to a
backbone-dominated program; this probe turns that claim into a measured
number.  Variants (same precision mode and postprocess backend throughout,
so the head is the only difference):

  flagship        — stoqa9pt + hrchr82r (the reference production pair)
  ensemble-mixed  — head88 := ensemble88-mixed (2 members), head96 unchanged
  ensemble-3      — head88 := ensemble88 (3 trained-here members)
  ensemble96-trio — head96 := ensemble96 (3 members, mixed architectures
                    incl. SE attention), head88 unchanged
  ensemble96-stacked-64 — head96 := ensemble96-stacked (the full ridge-
                    stacked 64-member pool) — the stress case for the
                    "tiny heads are nearly free" premise
  unified-best    — the shipped best-accuracy artifact (BOTH stacked-mixed
                    heads: 33-member 88 + 66-member 96) — what
                    pretrained.best_detector() actually costs

CAVEAT (late r3): the chip's absolute rate drifts up to ~40% across minutes
in this container, so this SEQUENTIAL sweep is only comparable within a
stable window (verify the flagship row against its historical ~88k before
trusting the others).  For robust A/B conclusions use the interleaved
paired-ratio methodology of scripts/probe_unified_best_cost.py.

Usage:  python scripts/probe_ensemble_cost.py [iters]
Writes docs/ensemble_cost_probe.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "ensemble_cost_probe.json")


def main():
    import jax
    import numpy as np

    from headpose_tpu.models.unified import UnifiedPoseModel
    from headpose_tpu.pretrained import load_flagship, load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    batch = 128
    model, params = load_flagship()
    variants = {"flagship": (model, params)}
    for tag, name in (("ensemble-mixed", "ensemble88-mixed"),
                      ("ensemble-3", "ensemble88")):
        espec, eparams = load_pretrained(name)
        variants[tag] = (
            UnifiedPoseModel(backbone=model.backbone, head88=espec,
                             head96=model.head96),
            dict(params, head88=eparams))
    espec96, eparams96 = load_pretrained("ensemble96")
    variants["ensemble96-trio"] = (
        UnifiedPoseModel(backbone=model.backbone, head88=model.head88,
                         head96=espec96),
        dict(params, head96=eparams96))
    sspec, sparams = load_pretrained("ensemble96-stacked")
    variants["ensemble96-stacked-64"] = (
        UnifiedPoseModel(backbone=model.backbone, head88=model.head88,
                         head96=sspec),
        dict(params, head96=sparams))
    variants["unified-best"] = load_pretrained("unified-best")

    print("staging input buffers...", flush=True)
    bufs = staged_uint8_frames(batch)
    jax.block_until_ready(bufs)

    report = {"iters": iters, "batch": batch}
    for tag, (m, p) in variants.items():
        det = FaceDetector(m, p, precision="fast", postprocess="xla")
        args = (det.params, det.score_threshold, det.iou_threshold,
                det.max_faces, det.precision, det.postprocess)

        def run(images):
            return det._pipeline(args[0], images, *args[1:])

        t0 = time.time()
        jax.block_until_ready(jax.tree.leaves(run(bufs[0])))
        compile_s = time.time() - t0
        sec = sustained_seconds_per_dispatch(run, bufs, iters)
        fps = batch / sec
        report[tag] = {"frames_per_sec": round(fps, 1),
                       "ms_per_dispatch": round(sec * 1e3, 3),
                       "compile_s": round(compile_s, 1)}
        print(f"[{tag}] {fps:,.0f} frames/s sustained "
              f"({sec * 1e3:.3f} ms/dispatch)", flush=True)

    base = report["flagship"]["frames_per_sec"]
    for tag in [t for t in variants if t != "flagship"]:
        report[tag]["cost_pct_vs_flagship"] = round(
            100.0 * (base - report[tag]["frames_per_sec"]) / base, 2)
    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
