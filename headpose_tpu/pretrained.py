"""Pretrained models shipped with the framework.

`headpose_tpu/pretrained_models/unified-stoqa9pt-hrchr82r` is the production unified model
(BlazeFace backbone + SSD heads + reg1 stoqa9pt + reg2 hrchr82r, 110,964
params) imported from the reference's selected H5
(BlazePoser/blazeFaceDetectorH5.py:102) into the native format — forward
parity ≤2e-4, reproduces the measured BASELINE.md MAE.  With it the framework
is fully standalone: no reference mount needed to detect, demo, or benchmark.
"""
from __future__ import annotations

import os

__all__ = ["PRETRAINED_DIR", "FLAGSHIP", "BEST", "flagship_path",
           "load_flagship", "flagship_detector", "best_detector",
           "load_pretrained", "resolve_model_path", "pretrained_quality"]

PRETRAINED_DIR = os.path.join(os.path.dirname(__file__), "pretrained_models")
FLAGSHIP = "unified-stoqa9pt-hrchr82r"
# the served best model: the stacked-ensemble accuracy frontier distilled
# into single compact heads (scripts/distill_stack.py + build_unified_best_
# distilled.py) — ~flagship dispatch cost, plain-MLP map grafting, TFLite/
# AOT/edge exportable.  The live-member stacks remain as 'unified-best'.
BEST = "unified-best-distilled"


def load_pretrained(name: str):
    """(spec, params) for any artifact in pretrained_models/.

    Shipped: 'unified-stoqa9pt-hrchr82r' (the production unified model),
    'stoqa9pt-88' / 'hrchr82r-96' (the reference production heads, imported),
    and OUR trained-from-scratch GP-sweep winners:
    - 'sweep88-best' (softsign mlp128, SGD + ReduceLROnPlateau;
      scripts/sweep88_gp.py, docs/sweep88_gp_result.json): AFLW2000-Enlarged
      MAE 7.778 vs the reference production head's measured 7.810
      (BASELINE.md) — outcome-level trainer parity on the reference's own
      sweep objective, from the shipped-data subset alone.
    - 'sweep96-best' (tanh mlp32, SGD 3e-3; scripts/sweep96_arch_gp.py,
      docs/sweep96_arch_gp_result.json): AFLW2000 MAE 12.051 on the shipped
      96-d data — the best any trainer reaches here (the reference's own
      tf-keras trainer lands at 13.6-15.1 on the same data, docs/TRAINING.md;
      its production 8.03 needed the unshipped training file).
    - 'ensemble88' (scripts/ensemble88.py, docs/ensemble88_result.json):
      EnsembleHead over a trained-here pool (best GP config per architecture
      x 4 seeds = 32 members, shipped data only), members greedily selected
      by the sweep objective with a 0.005-deg noise floor — the reference's
      own best-of-pool procedure: AFLW-Enlarged 7.740, beating both
      sweep88-best (7.778) and stoqa9pt (7.810); 40/40 split-half control
      wins (docs/ensemble88_holdout.json).
    - 'ensemble88-mixed': our mlp128 member averaged with the IMPORTED
      reference production head (labeled as such — not a trained-here
      claim): AFLW-Enlarged 7.653 / BIWI 3.623, the best 88-d head on the
      reference's sweep objective in either ecosystem.
    - 'ensemble96' (scripts/ensemble96.py, docs/ensemble96_result.json):
      the 96-family pool ensemble (32-member pool, no teacher, shipped
      data only) — AFLW2000 10.357, beating the best single trained-here
      draw (12.05) by 1.7 deg at BIWI 4.20 (matching the best singles);
      split-half control wins 40/40 (docs/ensemble96_holdout.json).
      Prefer 'distill96' (8.02) when teacher-derived weights are
      acceptable.
    - 'ensemble96-stacked' / 'ensemble88-stacked'
      (scripts/stack_ensemble.py, docs/ensemble_stack_result.json):
      ridge-stacked pools — per-member per-angle weights + intercept,
      calibrated on labeled AFLW rows + the BIWI val split (supervision
      disclosed in their metadata; more test-domain supervision than the
      reference sweep's own full-test-MAE selection, so never a zero-shot
      claim).  Honest numbers = 40-split holdout means (fit on one AFLW
      half, scored on the unseen half): 96-stacked AFLW 7.778±0.17 / BIWI
      4.41 — beats the teacher hrchr82r (8.031 / 13.08) on BOTH its test
      sets with NO teacher; 88-stacked AFLW 7.658±0.19 (vs uniform
      ensemble 7.740, reference 7.810), trading BIWI (4.60 vs 3.45).
      The '-mixed' variants stack the teacher-derived heads into the pool
      (labeled in metadata): 'ensemble96-stacked-mixed' AFLW 7.533±0.17
      holdout — the best 96-d head in either ecosystem;
      'ensemble88-stacked-mixed' 7.647±0.20 at BIWI 4.26.
    - 'unified-back-distilled' (scripts/distill_back.py): the 256-input
      back-camera topology (BLAZEFACE_BACK — reserved but never shipped by
      the reference, blazeFaceDetectorH5.py:8-11), brought up by
      three-stage distillation from the front flagship (teacher warm start
      → prefix alignment → whole-network polish, train/detector.py) on
      synthetic imagery, with the teacher's pose heads grafted unchanged.
      Held-out (the 112-image parity corpus, never seen in training):
      detection-set agreement with the reference goldens and
      feature/score/loc error distributions live in its metadata and
      docs/distill_back_result.json.  HONESTLY LABELED a topology
      bring-up: it mimics the front detector, it is NOT a real-world
      back-camera face detector — retrain when real 256-input data exists.
    - 'unified-best' (scripts/build_unified_best.py): the flagship backbone
      + SSD heads joined with both '-stacked-mixed' ensembles — the most
      accurate end-to-end pipeline in either ecosystem.  Detections are
      bit-identical to the flagship (same imported production backbone);
      only the pose regressors differ.  Head provenance/holdouts are copied
      into the artifact metadata; serving cost is ~1.9x flagship dispatch
      time (paired on-chip A/B after the grouped-member rewrite — 3.0x
      before it; docs/unified_best_cost.json).
    - 'stack88-distilled' / 'stack96-distilled' (scripts/distill_stack.py,
      docs/distill_stack_result.json): the stacked frontiers compressed
      into single 256-128 tanh MLPs by feature-space distillation (fresh
      init, no labels consumed; the teachers' AFLW+BIWI-val calibration
      supervision is inherited and disclosed; since r5 the distill pool
      is BIWI-only — no AFLW2000 crop-variant files — so eval imagery is
      unseen at the image level, not just the file level).  AFLW 7.303 /
      7.283 — below their teachers' holdout means — at single-head cost,
      with plain-MLP map grafting (no survivors profile) and
      TFLite/AOT/edge exportability.
    - 'unified-best-distilled' (scripts/build_unified_best_distilled.py):
      the flagship backbone + SSD heads joined with both stack-distilled
      heads — the SERVED best model (`BEST`/`best_detector`): the
      accuracy frontier at ~flagship dispatch cost
      (docs/unified_best_cost.json)."""
    from .tools.export import load_model

    path = os.path.join(PRETRAINED_DIR, name)
    if not os.path.isdir(path):
        raise FileNotFoundError(f"pretrained model missing: {path}")
    if pretrained_quality(name) == "synthetic-bringup":
        import warnings

        warnings.warn(
            f"'{name}' is a synthetic-imagery bring-up artifact (its "
            "metadata documents the provenance) — NOT parity-certified "
            "against the reference and NOT validated on real-world data; "
            "treat outputs accordingly", UserWarning, stacklevel=2)
    return load_model(path)


def pretrained_quality(name: str) -> str:
    """Provenance tier of a shipped artifact, from its spec.json metadata:
    'parity-certified' (imported reference production weights, corpus-
    certified), 'trained-here' (weights trained in this repo on shipped
    data; supervision details in the artifact metadata), or
    'synthetic-bringup' (topology bring-up on synthetic imagery — e.g.
    'unified-back-distilled' — load_pretrained warns on these)."""
    import json

    path = os.path.join(PRETRAINED_DIR, name, "spec.json")
    if not os.path.isfile(path):
        raise FileNotFoundError(f"pretrained model missing: {path}")
    with open(path) as f:
        return json.load(f).get("metadata", {}).get("quality", "unlabeled")


def resolve_model_path(model_path: str | None) -> str | None:
    """Map a pretrained registry name (e.g. 'unified-best') to its shipped
    model directory; paths that exist on disk (and None) pass through.
    Every user-facing --model/model_path entry point (demo, offline,
    compat.blazeFaceDetector) routes through this, so registry names work
    anywhere a path does."""
    if model_path is not None and not os.path.exists(model_path):
        registry = os.path.join(PRETRAINED_DIR, model_path)
        if os.path.isdir(registry):
            return registry
    return model_path


def flagship_path() -> str | None:
    path = os.path.join(PRETRAINED_DIR, FLAGSHIP)
    return path if os.path.isdir(path) else None


def load_flagship():
    """(UnifiedPoseModel, params) for the shipped production model."""
    return load_pretrained(FLAGSHIP)


def flagship_detector(**kwargs):
    """A ready-to-use FaceDetector on the shipped production model."""
    from .runtime.detector import FaceDetector

    model, params = load_flagship()
    return FaceDetector(model, params, **kwargs)


def best_detector(**kwargs):
    """A ready-to-use FaceDetector on the served best model
    ('unified-best-distilled'): flagship detections with the stacked
    accuracy frontier distilled into single compact pose heads — AFLW
    7.303/7.283, ~flagship dispatch cost, TFLite/AOT/edge exportable.

    The heads are plain per-vector MLPs, so the default map grafting is
    EXACT (the survivors-vs-map divergence of docs/headeval_divergence.json
    is a property of the SE-gated ensemble members, which the distilled
    heads no longer have) and every head_eval profile serves the same
    function.  For the live 99-member stacks themselves, load
    'unified-best' — its SE-gated members make head_eval='survivors' (the
    'auto' default there) mandatory for advertised-accuracy serving."""
    from .runtime.detector import FaceDetector

    model, params = load_pretrained(BEST)
    return FaceDetector(model, params, **kwargs)
