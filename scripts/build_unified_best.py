"""Assemble and ship `pretrained_models/unified-best`: the flagship BlazeFace
backbone + SSD heads joined (models/unified.py::join_models — the functional
equivalent of the reference's JoinModels.py:5-90 graph surgery) with the best
pose heads in either ecosystem:

  head88 := ensemble88-stacked-mixed   (AFLW-Enlarged 7.647 +/- 0.20 on
            40-split holdout, BIWI 4.26 — vs the reference production
            stoqa9pt's 7.810 / 3.45)
  head96 := ensemble96-stacked-mixed   (AFLW2000 7.533 +/- 0.17 holdout,
            BIWI 4.59 — vs the reference production hrchr82r's 8.031 / 13.09)

Detections (boxes / keypoints / scores) are bit-identical to the flagship —
the backbone and SSD heads are the same imported production weights; only the
pose regressors differ.  Serving cost of stacked-ensemble heads was measured
on-chip at 2-20% of the pipeline depending on pool size
(docs/ensemble_cost_probe.json); accuracy provenance, calibration supervision,
and holdout methodology live in each head's own metadata and
docs/TRAINING.md (the stacks see labeled AFLW rows + the BIWI val split
during ridge calibration — disclosed there and copied into this artifact's
metadata; never a zero-shot claim).

Validation before writing: head params must be IDENTICAL to the shipped
ensemble artifacts', and the detection set on the golden production image
must match the flagship exactly.

Usage:  python scripts/build_unified_best.py
"""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # assembly + parity: no TPU
    import numpy as np

    from headpose_tpu.models.unified import join_models
    from headpose_tpu.pretrained import (PRETRAINED_DIR, load_flagship,
                                         load_pretrained)
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.tools.export import save_model

    flagship, fparams = load_flagship()
    h88, p88 = load_pretrained("ensemble88-stacked-mixed")
    h96, p96 = load_pretrained("ensemble96-stacked-mixed")
    model, params = join_models(flagship.backbone, fparams["backbone"],
                                h88, p88, h96, p96)

    # the accuracy claims transfer ONLY if the joined head params are the
    # shipped ensemble artifacts' params, verbatim
    for field, src in (("head88", p88), ("head96", p96)):
        ours, theirs = (jax.tree.leaves(params[field]), jax.tree.leaves(src))
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # detection-set parity vs the flagship on the golden production image
    golden = np.load(os.path.join(REPO, "tests", "golden",
                                  "e2e_production.npz"))
    img = np.asarray(golden["img"], np.uint8)
    res_best = FaceDetector(model, params).detect_single(img)
    res_flag = FaceDetector(flagship, fparams).detect_single(img)
    np.testing.assert_array_equal(res_best.boxes, res_flag.boxes)
    np.testing.assert_array_equal(res_best.scores, res_flag.scores)
    assert len(res_best) == len(golden["scores"]) > 0
    assert np.all(np.isfinite(res_best.poses))
    # poses come from different (better) heads — same ballpark, not equal
    assert float(np.max(np.abs(res_best.poses - res_flag.poses))) < 45.0

    meta = {
        "built_by": "scripts/build_unified_best.py",
        "backbone": "unified-stoqa9pt-hrchr82r (imported reference "
                    "production weights; detections identical to flagship)",
        "head88": "ensemble88-stacked-mixed",
        "head96": "ensemble96-stacked-mixed",
    }
    for key, src in (("head88_provenance", "ensemble88-stacked-mixed"),
                     ("head96_provenance", "ensemble96-stacked-mixed")):
        import json
        with open(os.path.join(PRETRAINED_DIR, src, "spec.json")) as f:
            m = json.load(f)["metadata"]
        meta[key] = {k: m[k] for k in
                     ("calibration", "holdout_summary", "metrics",
                      "teacher_derived_members") if k in m}

    out = os.path.join(PRETRAINED_DIR, "unified-best")
    save_model(out, model, params, metadata=meta)

    # round-trip: the saved artifact reproduces the validated outputs
    m2, p2 = load_pretrained("unified-best")
    res2 = FaceDetector(m2, p2).detect_single(img)
    np.testing.assert_array_equal(res2.boxes, res_best.boxes)
    np.testing.assert_array_equal(res2.poses, res_best.poses)
    print(f"wrote {out}: {len(res_best)} golden detections, "
          f"max |pose delta| vs flagship "
          f"{float(np.max(np.abs(res_best.poses - res_flag.poses))):.2f} deg")


if __name__ == "__main__":
    main()
