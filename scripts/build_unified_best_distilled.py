"""Assemble `pretrained_models/unified-best-distilled`: the accuracy frontier
at flagship serving cost.

`unified-best` carries the stacked-mixed ensembles (99 live members) and
costs a paired-median 1.87x flagship dispatch (docs/unified_best_cost.json);
its SE-gated members force the survivors serving profile and block
TFLite/edge export.  scripts/distill_stack.py compressed each stack into ONE
compact MLP (docs/distill_stack_result.json), so this artifact joins the
flagship backbone + SSD heads with `stack88-distilled` + `stack96-distilled`
(models/unified.py::join_models — the functional equivalent of the
reference's JoinModels.py:5-90 graph surgery):

  * detections bit-identical to the flagship (same imported production
    backbone weights; only the pose regressors differ),
  * pose heads within ~0.4 deg AFLW MAE of the stacks they mimic and still
    well ahead of the reference production heads (7.810 / 8.031),
  * plain MLP heads: map-graftable (NO survivors profile needed — the
    head_eval divergence is a property of SE-gated members), TFLite/AOT/
    edge exportable, and serving at ~flagship dispatch cost
    (docs/unified_best_cost.json gains the paired probe).

Validation before writing: head params byte-identical to the shipped
distilled artifacts'; detection set on the golden production image identical
to the flagship's.  Usage:  python scripts/build_unified_best_distilled.py
"""
from __future__ import annotations

import json
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
    h88, p88 = load_pretrained("stack88-distilled")
    h96, p96 = load_pretrained("stack96-distilled")
    model, params = join_models(flagship.backbone, fparams["backbone"],
                                h88, p88, h96, p96)

    for field, src in (("head88", p88), ("head96", p96)):
        ours, theirs = (jax.tree.leaves(params[field]), jax.tree.leaves(src))
        assert len(ours) == len(theirs)
        for a, b in zip(ours, theirs):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    golden = np.load(os.path.join(REPO, "tests", "golden",
                                  "e2e_production.npz"))
    img = np.asarray(golden["img"], np.uint8)
    res_best = FaceDetector(model, params).detect_single(img)
    res_flag = FaceDetector(flagship, fparams).detect_single(img)
    np.testing.assert_array_equal(res_best.boxes, res_flag.boxes)
    np.testing.assert_array_equal(res_best.scores, res_flag.scores)
    assert len(res_best) == len(golden["scores"]) > 0
    assert np.all(np.isfinite(res_best.poses))
    assert float(np.max(np.abs(res_best.poses - res_flag.poses))) < 45.0

    meta = {
        "built_by": "scripts/build_unified_best_distilled.py",
        "quality": "trained-here",
        "backbone": "unified-stoqa9pt-hrchr82r (imported reference "
                    "production weights; detections identical to flagship)",
        "head88": "stack88-distilled",
        "head96": "stack96-distilled",
        "serving": "plain MLP heads — default map grafting is exact (no "
                   "survivors profile needed), TFLite/AOT/edge exportable, "
                   "~flagship dispatch cost",
    }
    for key, src in (("head88_provenance", "stack88-distilled"),
                     ("head96_provenance", "stack96-distilled")):
        with open(os.path.join(PRETRAINED_DIR, src, "spec.json")) as f:
            m = json.load(f)["metadata"]
        meta[key] = {k: m[k] for k in
                     ("provenance", "aflw2000_mae", "biwi_mae",
                      "teacher_agreement_mae_deg", "teacher_in_sample_aflw",
                      "teacher_holdout_aflw") if k in m}

    out = os.path.join(PRETRAINED_DIR, "unified-best-distilled")
    save_model(out, model, params, metadata=meta)

    m2, p2 = load_pretrained("unified-best-distilled")
    res2 = FaceDetector(m2, p2).detect_single(img)
    np.testing.assert_array_equal(res2.boxes, res_best.boxes)
    np.testing.assert_array_equal(res2.poses, res_best.poses)
    print(f"wrote {out}: {len(res_best)} golden detections, "
          f"max |pose delta| vs flagship "
          f"{float(np.max(np.abs(res_best.poses - res_flag.poses))):.2f} deg")


if __name__ == "__main__":
    main()
