"""Architecture + hyperparameter GP sweep for the 88 family.

Goal: the best head our trainer can produce on the SHIPPED 88-d data
(BIWI_Train_Enlarged only — the reference's production head stoqa9pt
additionally used BIWI_NoTrack_Enlarged_88, which is not shipped), measured
on the reference's own eval (Model-96/test.py procedure):
test_AFLW2000(Enlarged)_mae, the sweep objective of Model-96/sweep.yaml.

Baseline to beat (BASELINE.md, measured): stoqa9pt = 7.81 deg AFLW-Enlarged,
3.45 deg BIWI_Test_Enlarged — the best of 109 reference sweep runs on MORE
data.

Run:  PYTHONPATH=/root/repo python scripts/sweep88_gp.py [--runs 60]
Writes docs/sweep88_gp_result.json and saves the best head to
scripts/out/best88/ (native format, tools.export).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from headpose_tpu.data import standard_splits
from headpose_tpu.models.heads import (MLPHead, ResidualMLPHead, SkipMLPHead,
                                       SEMLPHead)
from headpose_tpu.train import TrainConfig, fit
from headpose_tpu.train.sweep import SweepConfig, run_sweep

ARCHS = {
    # reference zoo families (fixed widths from the reference architectures)
    "residual": lambda act, dr: ResidualMLPHead(in_features=88, activation=act,
                                                dropout_rate=dr),
    "skip": lambda act, dr: SkipMLPHead(in_features=88, activation=act,
                                        dropout_rate=dr),
    "se": lambda act, dr: SEMLPHead(in_features=88),
    # MLP chains (the create_model / bestmodelV1 / stoqa9pt shape and wider)
    "mlp32": lambda act, dr: MLPHead(88, ((32, act), (3, "linear")), dr),
    "mlp64": lambda act, dr: MLPHead(88, ((64, act), (3, "linear")), dr),
    "mlp128": lambda act, dr: MLPHead(88, ((128, act), (3, "linear")), dr),
    "mlp64x32": lambda act, dr: MLPHead(
        88, ((64, act), (32, act), (3, "linear")), dr),
    "mlp128x64": lambda act, dr: MLPHead(
        88, ((128, act), (64, act), (3, "linear")), dr),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=60)
    ap.add_argument("--data_dir",
                    default="/root/reference/FeatureMaps-Datasets")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "out"))
    args = ap.parse_args()

    splits = standard_splits(args.data_dir, 88)
    train_ds = splits["train"]
    test_sets = {k[5:]: v for k, v in splits.items() if k.startswith("test_")}
    print(f"train rows: {len(train_ds)}; tests: "
          f"{ {k: len(v) for k, v in test_sets.items()} }", flush=True)

    sweep = SweepConfig(
        parameters={
            "arch": list(ARCHS),
            "activation": ["softsign", "tanh"],
            "learning_rate": [1e-4, 2.8e-4, 1e-3, 3e-3],
            "dropout_rate": [0.0, 1e-4, 1e-2, 5e-2, 1e-1],
            "regularizer_rate": [0.0, 1e-6, 1e-4, 1e-3, 1e-2],
            "optimizer": ["sgd", "adam"],
            "reduce_lr_on_plateau": [False, True],
        },
        metric="test_aflw2000_mae", goal="minimize",
        method="bayes", num_runs=args.runs, warmup=12, seed=0)

    if "aflw2000" not in test_sets:
        raise SystemExit(f"AFLW2000 test split missing from {args.data_dir} "
                         "— the sweep objective needs it")

    best_state = {"objective": float("inf"), "result": None, "params": None}
    seen = {}  # effective-config memo: 'se' ignores activation/dropout

    def objective(a):
        key_knobs = dict(a)
        if a["arch"] == "se":  # SEMLPHead is the fixed reference arch
            key_knobs.pop("activation"), key_knobs.pop("dropout_rate")
        key = json.dumps(key_knobs, sort_keys=True)
        if key in seen:  # duplicate effective config: no retraining
            print(json.dumps({"params": a, **seen[key], "dup": True}),
                  flush=True)
            return seen[key]
        t0 = time.time()
        cfg = TrainConfig(
            head="mlp", in_features=88, num_filters=64,
            activation=a["activation"], dropout_rate=a["dropout_rate"],
            regularizer_rate=a["regularizer_rate"],
            optimizer=a["optimizer"], learning_rate=a["learning_rate"],
            reduce_lr_on_plateau=a["reduce_lr_on_plateau"],
            total_epochs=4000)
        spec = ARCHS[a["arch"]](a["activation"], a["dropout_rate"])
        res = fit(cfg, train_ds, test_sets=test_sets, spec=spec)
        out = {"val_loss": res.best_val_loss, "best_epoch": res.best_epoch,
               "wall_s": round(time.time() - t0, 1)}
        for name, m in res.test_metrics.items():
            out[f"test_{name}_mae"] = m["mae"]
        if out["test_aflw2000_mae"] < best_state["objective"]:
            best_state.update(objective=out["test_aflw2000_mae"],
                              result=(spec, a, dict(out)),
                              params=res.params)
        seen[key] = out
        print(json.dumps({"params": a, **out}), flush=True)
        return out

    result = run_sweep(sweep, objective)
    print("BEST:", json.dumps(result.best, indent=2, default=str), flush=True)

    if best_state["result"] is None:  # e.g. every run diverged to NaN
        print("no finite-objective run; nothing to save", flush=True)
        return

    os.makedirs(os.path.join(args.out, "best88"), exist_ok=True)
    from headpose_tpu.tools.export import save_model
    spec, a, metrics = best_state["result"]
    save_model(os.path.join(args.out, "best88"), spec, best_state["params"],
               metadata={"sweep_params": a, "metrics": metrics,
                         "train_data": "BIWI_Train_Enlarged_88 (shipped only)"})

    doc = {"best": result.best,
           "runs": [{"params": r["params"], "metrics": r["metrics"]}
                    for r in result.runs]}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "docs", "sweep88_gp_result.json"), "w") as f:
        json.dump(doc, f, indent=2, default=str)
    print("saved best head + docs/sweep88_gp_result.json", flush=True)


if __name__ == "__main__":
    main()
