"""Benchmark: end-to-end detection+pose throughput on the flagship model.

Measures the fused image→detections pipeline (preprocess → BlazeFace backbone
+ SSD + pose heads → decode → NMS → pose gather, ONE XLA program) on whatever
accelerator jax selects (the driver runs this on a real TPU chip).

Baseline (BASELINE.md): the reference processes 20.6 faces/sec — batch-1
forward of the same unified model, 48.6 ms/frame on the container CPU, and it
cannot batch at all (input hardwired [1,128,128,3]).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json

BASELINE_FACES_PER_SEC = 20.6  # BASELINE.md, measured reference CPU throughput


def main() -> None:
    import jax

    import __graft_entry__ as ge

    # 'fast' serving mode: dense-composed 3x3 convs at 3-pass 'high'
    # precision — the fastest mode that holds the 0.1-degree reference-
    # parity budget on the 112-image certification corpus (pose error
    # p99 0.0039 / max 0.0064 deg, identical detection sets;
    # docs/certification.json).  Round 2 benched 'turbo' here on a
    # 3-image 0.07-deg claim; the corpus showed turbo's true p99 is
    # 0.22 deg, so the headline is now the honestly-certified mode.
    # 'pallas' postprocess: the fused single-kernel NMS (score filter +
    # greedy selection + survivor extraction + pose lookup in ONE Mosaic
    # kernel) is BIT-exact vs the XLA postprocess on-chip and 14% faster
    # end to end (88.1k -> 100.5k f/s, docs/pallas_postprocess_probe.json)
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    # batch 128 is the measured sweet spot: batches 64-128 cost near-equal
    # wall time (~1.3 ms, dispatch-latency-bound) and >128 crosses a hard
    # 2x step at the 128-lane tile boundary (docs/BENCH.md batch sweep).
    # Methodology (staged distinct buffers, 500 sustained dispatches, one
    # trailing block) lives in utils.profiling — shared with every probe.
    batch = 128
    bufs = staged_uint8_frames(batch)

    postprocess = "pallas"
    fn, (params, _) = ge.entry(precision="fast", postprocess=postprocess)
    fn = jax.jit(fn)
    try:
        jax.block_until_ready(jax.tree.leaves(fn(params, bufs[0])))
    except Exception as e:  # Mosaic toolchain/tunnel flake — don't lose the
        # round's artifact.  Notice goes to STDERR: stdout is contractually
        # ONE JSON line (CLAUDE.md).  The real message is logged because the
        # failure may NOT be the pallas kernel (e.g. a backbone compile or
        # tunnel drop) — in that case the XLA retry below will fail too and
        # the trail should say why.
        import sys
        print(f"first compile failed ({type(e).__name__}: "
              f"{(str(e).splitlines() or [''])[0][:300]}); "
              "retrying with the XLA postprocess",
              file=sys.stderr, flush=True)
        postprocess = "xla"
        fn, (params, _) = ge.entry(precision="fast", postprocess=postprocess)
        fn = jax.jit(fn)

    sec = sustained_seconds_per_dispatch(lambda b: fn(params, b), bufs)
    frames_per_sec = batch / sec
    pp = ("fused Pallas postprocess kernel" if postprocess == "pallas"
          else "XLA postprocess (pallas compile failed this run)")
    print(json.dumps({
        "metric": "end-to-end detect+pose throughput",
        "value": round(frames_per_sec, 1),
        "unit": f"frames/sec/chip (batch 128 uint8 128x128 frames on-device, NMS'd results out, sustained 500-dispatch loop, fast mode + {pp}: corpus-certified pose err p99 0.0039deg / max 0.0064deg vs reference, identical detection sets)",
        "vs_baseline": round(frames_per_sec / BASELINE_FACES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
