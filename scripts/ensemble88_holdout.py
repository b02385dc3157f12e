"""Held-out validation of the ensemble88 selection procedure.

docs/ensemble88_result.json reports `objective_greedy` — members greedy-
selected on the sweep objective (test AFLW2000 MAE), mirroring the
reference's own best-of-pool selection (Model-96/sweep.yaml objective,
blazeFaceDetectorH5.py:102 ships the best-of-109 on that metric).  The
honest critique of BOTH procedures is selection overfitting: the metric
that picks the winner is the metric being reported.

This script quantifies that effect with split-half cross-validation:
AFLW2000 is split into random halves A/B; members are greedy-selected on A
only and the resulting ensemble is scored on the untouched half B — against
the single model that the reference's procedure (argmin on A) would have
shipped, scored on the same B.  Repeated over many splits, the paired
delta (single minus ensemble on held-out data) measures the real
generalization gain of ensembling over best-of-pool, with selection
overfitting cancelled out by construction.

Needs the member pool cached by scripts/ensemble88.py (scripts/out/pool88).
Run:  PYTHONPATH=/root/repo python scripts/ensemble88_holdout.py
Writes docs/ensemble88_holdout.json.
"""
from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from headpose_tpu.data import standard_splits
from headpose_tpu.pretrained import load_pretrained
from headpose_tpu.tools.export import load_model
from ensemble88 import greedy_select, mae

N_SPLITS = 40
DATA_DIR = "/root/reference/FeatureMaps-Datasets"


def main() -> None:
    pool_dir = os.path.join(_HERE, "out", "pool88")
    if not os.path.isdir(pool_dir):
        raise SystemExit("member pool missing — run scripts/ensemble88.py first")
    members = []
    for name in sorted(os.listdir(pool_dir)):
        spec, params = load_model(os.path.join(pool_dir, name))
        members.append((spec, params, name))
    if not members:
        raise SystemExit("member pool empty — run scripts/ensemble88.py first")
    s_spec, s_params = load_pretrained("stoqa9pt-88")
    members.append((s_spec, s_params, "stoqa9pt-88(imported)"))
    n_native = len(members) - 1

    test = standard_splits(DATA_DIR, 88)["test_aflw2000"]
    y = np.asarray(test.poses)
    preds = [np.asarray(jax.jit(spec.apply)(params, test.features))
             for spec, params, _ in members]
    n = y.shape[0]

    rng = np.random.default_rng(0)
    rows = []
    for split in range(N_SPLITS):
        perm = rng.permutation(n)
        a_idx, b_idx = perm[: n // 2], perm[n // 2:]
        for pool_name, k in (("native", n_native), ("mixed", len(members))):
            pa = [p[a_idx] for p in preds[:k]]
            pb = [p[b_idx] for p in preds[:k]]
            ya, yb = y[a_idx], y[b_idx]
            chosen = greedy_select(pa, ya)
            ens_b = mae(np.mean([pb[i] for i in chosen], axis=0), yb)
            # the reference procedure: ship argmin-on-A, score on B
            single = min(range(k), key=lambda i: mae(pa[i], ya))
            single_b = mae(pb[single], yb)
            rows.append({"split": split, "pool": pool_name,
                         "n_members": len(chosen),
                         "ensemble_b": ens_b, "single_b": single_b,
                         "delta": single_b - ens_b})

    report = {"n_splits": N_SPLITS, "pool_size_native": n_native,
              "rows": rows, "summary": {}}
    for pool_name in ("native", "mixed"):
        d = np.array([r["delta"] for r in rows if r["pool"] == pool_name])
        e = np.array([r["ensemble_b"] for r in rows if r["pool"] == pool_name])
        s = np.array([r["single_b"] for r in rows if r["pool"] == pool_name])
        report["summary"][pool_name] = {
            "ensemble_mae_mean": float(e.mean()),
            "single_mae_mean": float(s.mean()),
            "delta_mean": float(d.mean()), "delta_std": float(d.std()),
            "delta_min": float(d.min()),
            "ensemble_wins": int((d > 0).sum()), "n": int(d.size)}
        print(pool_name, json.dumps(report["summary"][pool_name]), flush=True)

    out = os.path.join(os.path.dirname(_HERE), "docs",
                       "ensemble88_holdout.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
