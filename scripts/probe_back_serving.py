"""Paired on-chip A/B: serving cost of the distilled BACK-camera pipeline
(unified-back-distilled, 256-input BLAZEFACE_BACK + grafted pose heads) vs
the front flagship.

The back topology runs one extra BlazeBlock stage and its first two stages
at 2x the front's resolution (256->128->64 vs 128->64), so its forward does
~2.5x the stem-region pixel work; this probe measures what that actually
costs end to end under the production serving configuration ('fast' mode,
fused Pallas postprocess, batch 128).

Chip-rate drift makes sequential sweeps incomparable (CLAUDE.md): programs
are INTERLEAVED round-robin and the per-round paired time ratio is the
result.  Two back variants are timed:
  * back-256: native 256x256 frames (the realistic back-camera input);
  * back-128: the same 128x128 frames the flagship sees (the pipeline
    bicubic-upsamples internally) — isolating the model cost from the
    input-resolution difference.

Usage:  python scripts/probe_back_serving.py [iters] [rounds]
Writes docs/back_serving.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "back_serving.json")


def main():
    import jax

    from headpose_tpu.pretrained import load_flagship, load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch = 128

    bufs128 = staged_uint8_frames(batch, size=128)
    bufs256 = staged_uint8_frames(batch, size=256)
    jax.block_until_ready([bufs128, bufs256])

    front = FaceDetector(*load_flagship(), precision="fast",
                         postprocess="pallas")
    back = FaceDetector(*load_pretrained("unified-back-distilled"),
                        precision="fast", postprocess="pallas")

    variants = {
        "flagship-128": (front, bufs128),
        "back-128": (back, bufs128),
        "back-256": (back, bufs256),
    }
    fns, compile_s = {}, {}
    for tag, (det, bufs) in variants.items():
        t0 = time.time()
        jax.block_until_ready(jax.tree.leaves(det.detect(bufs[0])))
        compile_s[tag] = round(time.time() - t0, 1)
        fns[tag] = (det.detect, bufs)
        print(f"{tag}: compiled in {compile_s[tag]} s", flush=True)

    ms = {t: [] for t in fns}
    for r in range(rounds):
        for t, (f, bufs) in fns.items():
            ms[t].append(sustained_seconds_per_dispatch(f, bufs, iters) * 1e3)
        print(f"round {r}: " + "  ".join(f"{t}={ms[t][-1]:.3f}ms"
                                         for t in ms), flush=True)

    def med(t):
        return statistics.median(ms[t])

    ratios = {t: [b / a for a, b in zip(ms["flagship-128"], ms[t])]
              for t in ("back-128", "back-256")}
    report = {
        "iters": iters, "rounds": rounds, "batch": batch,
        "config": "precision='fast', postprocess='pallas'",
        "methodology": "interleaved paired rounds; ratios cancel the "
                       "container's chip-rate drift (CLAUDE.md)",
        "compile_s": compile_s,
        "ms_per_dispatch": {t: [round(x, 3) for x in v]
                            for t, v in ms.items()},
        "median_paired_ratio_vs_flagship": {
            t: round(statistics.median(r), 3) for t, r in ratios.items()},
        "median_fps": {t: round(batch / (med(t) / 1e3), 1) for t in ms},
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("median_paired_ratio_vs_flagship", "median_fps")}))
    print(f"saved {OUT}", flush=True)


if __name__ == "__main__":
    main()
