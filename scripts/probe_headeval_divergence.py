"""Quantify the map-vs-survivors head-evaluation divergence on the corpus.

`head_eval='map'` grafts the pose heads over the full feature maps (the
reference's JoinModels semantics); `head_eval='survivors'` evaluates each
detected face's gathered feature vector independently (the training/dataset
semantics, SURVEY.md §2.15).  For per-cell 1x1-conv families the two are
identical; for SE-gated members the map path pools the SE gate over the
WHOLE map — a different function from the per-vector one the stacked
ensembles were calibrated and holdout-scored on.

This probe runs the flagship (pure per-cell heads — expected ~0) and
unified-best (stacked-mixed ensembles with 4+8 SE-gated members) in both
profiles over the 112-image parity corpus and reports the pose divergence
DISTRIBUTION per model.  Detections are asserted identical (the SSD branch
is untouched by head_eval), so poses pair by slot.

Run on the real chip:  python scripts/probe_headeval_divergence.py
Writes docs/headeval_divergence.json.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CORPUS = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")
OUT = os.path.join(REPO, "docs", "headeval_divergence.json")


def dist(errs: np.ndarray) -> dict:
    return {"n": int(len(errs)),
            "p50": float(np.percentile(errs, 50)),
            "p90": float(np.percentile(errs, 90)),
            "p99": float(np.percentile(errs, 99)),
            "max": float(errs.max())}


def main():
    import jax

    from headpose_tpu.pretrained import load_flagship, load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector

    data = np.load(CORPUS)
    imgs = np.asarray(data["imgs"], np.uint8)
    on_tpu = jax.default_backend() == "tpu"
    report = {"images": int(len(imgs)), "corpus": os.path.basename(CORPUS),
              "precision": "highest", "backend": jax.default_backend()}
    for tag, (m, p) in (("flagship", load_flagship()),
                        ("unified-best", load_pretrained("unified-best"))):
        res = {}
        for he in ("map", "survivors"):
            det = FaceDetector(m, p, head_eval=he)  # precision='highest'
            res[he] = det.detect(imgs)
            jax.block_until_ready(res[he].scores)
        vm = np.asarray(res["map"].valid)
        vs = np.asarray(res["survivors"].valid)
        assert np.array_equal(vm, vs), f"{tag}: detection sets differ!"
        np.testing.assert_array_equal(np.asarray(res["map"].boxes),
                                      np.asarray(res["survivors"].boxes))
        d = np.abs(np.asarray(res["map"].poses)
                   - np.asarray(res["survivors"].poses)).max(-1)[vm]
        report[tag] = {"pose_divergence_deg": dist(d),
                       "detections": int(vm.sum())}
        print(f"{tag}: {vm.sum()} detections, map-vs-survivors pose "
              f"divergence p50 {np.percentile(d, 50):.4g} "
              f"p99 {np.percentile(d, 99):.4g} max {d.max():.4g} deg",
              flush=True)
    if on_tpu:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {OUT}")
    else:
        # the committed JSON is cited as ON-CHIP evidence (README, PARITY,
        # best_detector docstring) — never overwrite it from a CPU run
        print("not on TPU — results not written")


if __name__ == "__main__":
    main()
