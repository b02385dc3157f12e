"""One-command evidence regeneration: every certification, in order.

VERDICT r4 item 7: a serving-default or corpus change must not be able to
leave a committed certificate stale piecemeal.  This manifest runner
re-executes every certification script in dependency order (each in its own
subprocess, so per-script jax platform configuration stays isolated) and
prints one summary table.  The corpora themselves are NOT regenerated here —
they are golden inputs (make_parity_corpus.py / make_stress_corpus.py
change the goldens and therefore the evidence; rerun those explicitly,
then this).

Run on the chip (the TPU steps refuse to certify on CPU):

    python scripts/certify_all.py              # everything (~20-30 min)
    python scripts/certify_all.py --list       # show the manifest
    python scripts/certify_all.py --only stress,stress-tflite
    python scripts/certify_all.py --gate       # + pytest certification gates

Regenerates: docs/certification.json (modes + pallas merge + stress incl.
best_detector/overflow/uncapped/AOT + tflite_edge), docs/
tflite_certification.json (corpus + resize sections), docs/
certification_back.json.
"""
from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HERE = os.path.dirname(os.path.abspath(__file__))

# (name, argv, needs, writes) — `needs` are manifest names that must have
# succeeded (or been explicitly skipped) earlier in the same invocation.
MANIFEST = [
    ("modes", ["certify_modes.py"], [],
     "docs/certification.json (primary 4-mode section)"),
    ("modes-pallas", ["certify_modes.py", "--postprocess", "pallas",
                      "highest", "fast"], ["modes"],
     "docs/certification.json (modes_pallas_postprocess)"),
    ("stress", ["certify_stress.py"], ["modes"],
     "docs/certification.json (stress: modes/pallas/overflow_uncapped/"
     "best_detector/aot_fast)"),
    ("stress-tflite", ["certify_stress.py", "--only-tflite"], ["stress"],
     "docs/certification.json (stress.tflite_edge; forced-CPU subprocess)"),
    ("tflite", ["certify_tflite.py"], [],
     "docs/tflite_certification.json (corpus section)"),
    ("tflite-resize", ["certify_edge_resize.py"], ["tflite"],
     "docs/tflite_certification.json (resize section)"),
    ("back", ["certify_back.py"], [],
     "docs/certification_back.json"),
]

GATES = ["tests/test_certification.py", "tests/test_tflite.py"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated manifest names to run")
    ap.add_argument("--skip", default="",
                    help="comma-separated manifest names to skip")
    ap.add_argument("--gate", action="store_true",
                    help="finish with the pytest certification gates")
    args = ap.parse_args()

    if args.list:
        for name, argv, needs, writes in MANIFEST:
            dep = f"  (after {','.join(needs)})" if needs else ""
            print(f"{name:>14}: {' '.join(argv)}{dep}\n"
                  f"{'':>14}  -> {writes}")
        return 0

    only = set(args.only.split(",")) if args.only else None
    skip = {s for s in args.skip.split(",") if s}
    unknown = ((only or set()) | skip) - {m[0] for m in MANIFEST}
    if unknown:
        raise SystemExit(f"unknown manifest names: {sorted(unknown)}")

    results: dict[str, tuple[str, float]] = {}
    for name, argv, needs, _ in MANIFEST:
        if (only is not None and name not in only) or name in skip:
            results[name] = ("skipped", 0.0)
            continue
        missing = [n for n in needs
                   if results.get(n, ("", 0))[0] not in ("ok", "skipped")]
        if missing:
            print(f"--- {name}: BLOCKED (needs {missing})", flush=True)
            results[name] = ("blocked", 0.0)
            continue
        print(f"--- {name}: {' '.join(argv)}", flush=True)
        t0 = time.time()
        proc = subprocess.run([sys.executable, os.path.join(HERE, argv[0]),
                               *argv[1:]], cwd=REPO)
        dt = time.time() - t0
        results[name] = ("ok" if proc.returncode == 0 else "FAILED", dt)
        if proc.returncode != 0:
            print(f"--- {name} FAILED (rc {proc.returncode}) — downstream "
                  "steps that need it will be blocked", flush=True)

    print("\n=== certification summary ===")
    worst = 0
    for name, argv, _, writes in MANIFEST:
        status, dt = results[name]
        mark = {"ok": "OK ", "skipped": "-- ", "blocked": "BLK",
                "FAILED": "ERR"}[status]
        print(f" [{mark}] {name:<14} {dt:6.1f}s  {writes}")
        if status in ("FAILED", "blocked"):
            worst = 1
    if args.gate and worst == 0:
        print("\n--- pytest gates ---", flush=True)
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", *GATES, "-q", "-m", "smoke"],
            cwd=REPO)
        worst = max(worst, proc.returncode)
    return worst


if __name__ == "__main__":
    raise SystemExit(main())
