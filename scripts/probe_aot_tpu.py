"""On-chip validation of AOT serving artifacts (tools/aot.py).

Exports the flagship detector's 'fast' pipeline (the parity-certified bench
configuration, fused Pallas postprocess included) for batch 128 on the real
TPU, deserializes it back, and proves:
  1. the Mosaic custom call survives jax.export serialize/deserialize,
  2. ExportedDetector.detect is bit-identical to FaceDetector.detect,
  3. dispatch cost matches the source pipeline (paired interleaved rounds —
     chip rate drifts ~40% across minutes, docs/BENCH.md methodology).

Writes docs/aot_tpu.json.  One XLA compile each path (~30-90 s + the ~17 s
postprocess kernel); run sparingly.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/probe_aot_tpu.py
"""
import json
import os
import tempfile
import time

import jax
import numpy as np

from headpose_tpu.pretrained import flagship_detector
from headpose_tpu.tools.aot import export_detector, load_exported

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "aot_tpu.json")
ROUNDS, REPS = 5, 50


def paired_time(fns, args, rounds=ROUNDS, reps=REPS):
    """Interleaved round-robin timing (docs/BENCH.md drift methodology):
    per-round wall time of `reps` dispatches per variant, one block at the
    end of each variant's burst."""
    times = {k: [] for k in fns}
    for _ in range(rounds):
        for k, fn in fns.items():
            t0 = time.perf_counter()
            for a in args:
                r = fn(a)
            jax.block_until_ready(r)
            times[k].append((time.perf_counter() - t0) / len(args))
    return times


def main():
    assert jax.default_backend() == "tpu", (
        "this probe validates the TPU path; run under the axon backend")
    det = flagship_detector(precision="fast")

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (128, 128, 128, 3), dtype=np.uint8)
              for _ in range(8)]

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "flagship-fast")
        meta = export_detector(det, path, batch_sizes=(128,),
                               platforms=("tpu",))
        backend = meta["programs"]["128"]["postprocess"]
        size = os.path.getsize(os.path.join(
            path, meta["programs"]["128"]["file"]))
        aot = load_exported(path)

        # correctness: bit-identical slabs on varied inputs
        max_abs = 0.0
        fields = ("boxes", "keypoints", "scores", "poses", "valid")
        for fr in frames[:3]:
            want, got = det.detect(fr), aot.detect(fr)
            for f in fields:
                a = np.asarray(getattr(want, f), np.float32)
                b = np.asarray(getattr(got, f), np.float32)
                max_abs = max(max_abs, float(np.abs(a - b).max()))

        staged = [jax.device_put(f) for f in frames]
        args = staged * (REPS // len(staged))
        times = paired_time({"native": det.detect, "aot": aot.detect}, args)

    per_round = [a / n for n, a in zip(times["native"], times["aot"])]
    result = {
        "postprocess_backend": backend,
        "program_bytes": size,
        "max_abs_diff": max_abs,
        "bit_exact": max_abs == 0.0,
        "dispatches_per_round": len(args),
        "native_ms_per_dispatch": [round(t * 1e3, 4) for t in times["native"]],
        "aot_ms_per_dispatch": [round(t * 1e3, 4) for t in times["aot"]],
        "aot_over_native_per_round": [round(r, 4) for r in per_round],
        # round 1 carries both variants' compile/warm-up — judge on the rest
        "aot_over_native_warm_median": round(
            float(np.median(per_round[1:])), 4),
        "note": (f"paired interleaved rounds, {len(args)} dispatches of "
                 "batch 128 cycling 8 staged buffers per variant per round; "
                 "round 1 is warm-up (first dispatch of each program) — "
                 "use aot_over_native_warm_median; "
                 "flagship 'fast' + fused Pallas postprocess"),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
