"""On-chip A/B: fused Pallas postprocess vs the XLA postprocess, measured
only as FULL-PIPELINE variants (CLAUDE.md benchmarking gotcha: forward-only
slices and bare kernel loops can be elided by this container's runtime; the
end-to-end detector program is the one timing methodology that proved
trustworthy).

Runs the bench.py methodology — batch 128, 8 staged input buffers, 500
sustained dispatches — on the flagship detector in 'fast' mode with
postprocess='xla' and postprocess='pallas', checks the two programs agree on
real content, and writes docs/pallas_postprocess_probe.json.

Usage:  python scripts/probe_pallas_postprocess.py [iters]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "pallas_postprocess_probe.json")


def main():
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)   # kill -USR1 <pid> → stack dump
    import jax

    from headpose_tpu.pretrained import flagship_detector

    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    batch = 128
    print("staging input buffers...", flush=True)
    bufs = staged_uint8_frames(batch)
    jax.block_until_ready(bufs)
    print("staged.", flush=True)
    golden = np.load(os.path.join(REPO, "tests", "golden",
                                  "e2e_production.npz"))
    # detection-rich content at the SAME program shape as the timing loop
    # (a second input shape would trigger a second Mosaic compile): center
    # crop of the 256x256 golden production image
    img = np.asarray(golden["img"], np.uint8)[64:192, 64:192]
    gimg = jax.device_put(np.broadcast_to(img, (batch, *img.shape)).copy())

    # build + compile both variants up front, then INTERLEAVE timing rounds
    # (r5 hardening: a single sequential shot of this probe once measured
    # pallas at 1.905 ms during a transient slow phase — 48% off the
    # stable value the very next run; sequential A-then-B is exactly the
    # methodology CLAUDE.md rejects for A/B conclusions)
    rounds = 3
    report = {}
    outs, fns = {}, {}
    for backend in ("xla", "pallas"):
        det = flagship_detector(precision="fast", postprocess=backend)
        args = (det.params, det.score_threshold, det.iou_threshold,
                det.max_faces, det.precision, det.postprocess)

        def run(images, det=det, args=args):
            return det._pipeline(args[0], images, *args[1:])

        t0 = time.time()
        jax.block_until_ready(jax.tree.leaves(run(bufs[0])))
        compile_s = time.time() - t0
        print(f"[{backend}] compile+first-run {compile_s:.0f} s", flush=True)
        outs[backend] = {k: np.asarray(v) for k, v in run(gimg).items()}
        fns[backend] = run
        report[backend] = {"compile_s": round(compile_s, 1)}

    ms = {b: [] for b in fns}
    for r in range(rounds):
        for b, f in fns.items():
            ms[b].append(sustained_seconds_per_dispatch(f, bufs, iters) * 1e3)
        print(f"round {r}: " + "  ".join(f"{b}={ms[b][-1]:.3f}ms"
                                         for b in ms), flush=True)
    import statistics
    for b in fns:
        med = statistics.median(ms[b])
        report[b].update({
            "frames_per_sec": round(batch / (med / 1e3), 1),
            "ms_per_dispatch": round(med, 3),
            "per_round_ms": [round(x, 3) for x in ms[b]],
        })
        print(f"[{b}] {batch / (med / 1e3):,.0f} frames/s sustained "
              f"(median {med:.3f} ms/dispatch over {rounds} interleaved "
              f"{iters}-iter rounds)", flush=True)
    report["paired_ratio_pallas_vs_xla"] = round(statistics.median(
        [p / x for x, p in zip(ms["xla"], ms["pallas"])]), 3)

    worst = max(float(np.abs(outs["xla"][k].astype(np.float64) -
                             outs["pallas"][k].astype(np.float64)).max())
                for k in outs["xla"])
    report["golden_content_maxerr"] = worst
    report["iters"] = iters
    report["batch"] = batch
    print(f"on-chip agreement on golden content: maxerr {worst:.2e}")

    with open(OUT, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
