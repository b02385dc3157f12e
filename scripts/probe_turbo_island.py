"""Probe bf16-island widths on the parity corpus: accuracy + throughput.

Round 2 picked the 'turbo' island (blocks 10..15 + SSD heads at single-pass
bf16) from a THREE-image max (0.0696 deg).  The 112-image corpus shows that
island's true distribution is p99 0.216 / max 4.2 deg — outside the 0.1-deg
parity budget.  This probe measures every trailing-island start on the corpus
(error distribution, detection-set agreement) AND its sustained batch-128
throughput, so the shipped default can be the WIDEST island whose p99 < 0.1
deg (VERDICT r2 item 1).

Run on the real chip:  python scripts/probe_turbo_island.py   (~10 min:
6 islands x 1 tunnel compile each + 1 throughput loop each)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from certify_modes import CORPUS, certify  # noqa: E402

OUT = os.path.join(REPO, "docs", "turbo_island_probe.json")
STARTS = (10, 11, 12, 13, 14, 15)   # island = blocks start..15 (+ SSD heads)


def throughput(det, batch=128, iters=500) -> float:
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    bufs = staged_uint8_frames(batch)
    sec = sustained_seconds_per_dispatch(lambda b: det.detect(b).scores,
                                         bufs, iters)
    return batch / sec


if __name__ == "__main__":
    import jax

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector

    # args: each is an island spec — "12" (trailing: 12..15), "11-14" (range),
    # or "15" / "11,13" (comma list with no dash = exact blocks)
    def parse(a):
        if "-" in a:
            lo, hi = a.split("-")
            return tuple(range(int(lo), int(hi) + 1))
        if "," in a:
            return tuple(int(x) for x in a.split(","))
        return tuple(range(int(a), 16))

    islands = [parse(a) for a in sys.argv[1:]] or [
        tuple(range(s, 16)) for s in STARTS]
    data = dict(np.load(CORPUS))
    model, params = load_flagship()
    report = json.load(open(OUT)) if os.path.exists(OUT) else {}
    for island in islands:
        start = f"{island[0]}..{island[-1]}" if island == tuple(
            range(island[0], island[-1] + 1)) else ",".join(map(str, island))

        def factory(mode, island=island):
            return FaceDetector(model, params, score_threshold=0.4,
                                iou_threshold=0.3, precision="turbo",
                                turbo_island=island)

        print(f"--- island start {start} (blocks {start}..15 + SSD heads) ---")
        r = certify(factory, data, modes=("turbo",))["turbo"]
        det = factory("turbo")
        fps = throughput(det)
        r["frames_per_sec_batch128"] = round(fps, 1)
        print(f"    throughput: {fps:,.0f} frames/sec")
        report[f"start_{start}"] = r
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    print("wrote", OUT)
