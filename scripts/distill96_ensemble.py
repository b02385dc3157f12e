"""Ensemble the distilled 96-family students (selection-free average).

scripts/distill96.py trains fresh students against the shipped hrchr82r
teacher (the generator-oracle of the unshipped `BIWI_train_features_96.npz`
— see its docstring).  A single student lands at ~the teacher's 8.03 deg
AFLW2000 MAE.  This script averages the per-seed students into an
`EnsembleHead` — NO member selection, so unlike the objective-greedy
ensemble88 variant there is no selection metric to overfit — and ships it
as `pretrained_models/distill96-ensemble` when it beats the best single
student on the reference's sweep objective (AFLW2000 MAE,
Model-96/test.py:41-54 procedure).

Needs checkpoints/distill96-s{seed}/best from scripts/distill96.py runs.
Run:  python scripts/distill96_ensemble.py [--seeds 0,1,2] [--ship]
Appends an "ensemble" section to docs/distill96_result.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DATASETS = "/root/reference/FeatureMaps-Datasets"
RESULT = os.path.join(REPO, "docs", "distill96_result.json")
OUT_DIR = os.path.join(REPO, "headpose_tpu", "pretrained_models",
                       "distill96-ensemble")

from distill96 import STUDENT_LAYERS  # noqa: E402  (same student family)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--ship", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from headpose_tpu.data.datasets import load_dataset
    from headpose_tpu.models import EnsembleHead, MLPHead
    from headpose_tpu.tools.evaluate import evaluate_head_pose_model
    from headpose_tpu.train.checkpoints import restore_pytree

    student = MLPHead(96, STUDENT_LAYERS)
    like = student.init(jax.random.PRNGKey(0))
    seeds = [int(s) for s in args.seeds.split(",")]
    members = []
    for s in seeds:
        path = os.path.join(REPO, "checkpoints", f"distill96-s{s}", "best")
        members.append(restore_pytree(path, like=like))

    test_sets = {
        "AFLW2000_features_96": load_dataset(os.path.join(
            DATASETS, "AFLW2000_features_96_0.7_1.npz")),
        "BIWI_Test_96": load_dataset(os.path.join(
            DATASETS, "BIWI_Test_Enlarged_features_96_0.7_1.npz")),
    }

    per_seed = {}
    for s, p in zip(seeds, members):
        per_seed[s] = {
            name: evaluate_head_pose_model(student, ds, params=p,
                                           verbose=False)["MAE"]["average"]
            for name, ds in test_sets.items()}
        print(f"seed {s}: {per_seed[s]}", flush=True)

    ens = EnsembleHead(members=tuple(student for _ in members))
    ens_params = {"members": members}
    ens_metrics = {
        name: evaluate_head_pose_model(ens, ds, params=ens_params,
                                       verbose=False)["MAE"]["average"]
        for name, ds in test_sets.items()}
    print(f"average-of-{len(members)} ensemble: {ens_metrics}", flush=True)

    summary = json.load(open(RESULT))
    summary["ensemble"] = {
        "seeds": seeds,
        "selection": "none — uniform average of every trained student",
        "per_seed_aflw": {str(s): per_seed[s]["AFLW2000_features_96"]
                          for s in seeds},
        "metrics": ens_metrics,
        "teacher_aflw": 8.031,
        "shipped": bool(args.ship),
    }
    with open(RESULT, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", RESULT, flush=True)

    if args.ship:
        from headpose_tpu.tools.export import save_model

        save_model(OUT_DIR, ens, ens_params, metadata={
            "provenance": "uniform average of fresh students distilled from "
                          "the shipped hrchr82r teacher "
                          "(scripts/distill96.py seeds "
                          f"{seeds}, then scripts/distill96_ensemble.py); "
                          "no member selection; labeled distillation, not "
                          "from-scratch training parity",
            "teacher": "hrchr82r (8.031 deg AFLW2000, BASELINE.md)",
            "metrics": ens_metrics})
        print("shipped", OUT_DIR, flush=True)


if __name__ == "__main__":
    main()
