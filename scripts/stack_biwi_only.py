"""BIWI-only-calibrated stacked ensembles: zero AFLW supervision.

The shipped stacks (scripts/stack_ensemble.py) calibrate their ridge weights
on labeled AFLW rows + the BIWI val split, so their headline numbers are
conditional on test-domain calibration labels (disclosed everywhere).  This
script answers VERDICT r3 item 6: refit the SAME member pools' combination
weights on BIWI labels ONLY — the val split held out of member training
(train_val_split(train, 0.2, 42), the fit() convention) — and score
AFLW2000 as a TRUE untouched test set.

If the BIWI-only stack still beats the reference production head's AFLW MAE
(stoqa9pt 7.810 / hrchr82r 8.031, BASELINE.md), the "beats the reference
with no test-domain supervision" claim becomes unconditional; either way
docs/ensemble_stack_result.json gains the biwi_only rows and
docs/TRAINING.md states which claim holds.

Members come from the shipped `ensemble{fam}-stacked-mixed` artifacts (the
pools of record — scripts/out caches do not survive rounds), so the member
weights are byte-identical to the shipped stacks'; ONLY the combination
weights differ.  Run:  python scripts/stack_biwi_only.py
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

from headpose_tpu.data import standard_splits, train_val_split
from headpose_tpu.models import EnsembleHead
from headpose_tpu.pretrained import load_pretrained
from headpose_tpu.tools.export import save_model
from ensemble88 import mae
from stack_ensemble import apply_stack, fit_with_cv

DATA = "/root/reference/FeatureMaps-Datasets"
RESULT = os.path.join(os.path.dirname(_HERE), "docs",
                      "ensemble_stack_result.json")

REFERENCE_AFLW = {88: 7.810, 96: 8.031}


def member_preds(spec: EnsembleHead, params, X: np.ndarray) -> np.ndarray:
    """(K, n, 3) per-member forwards of a shipped EnsembleHead."""
    X = np.asarray(X)
    out = []
    for m_spec, m_params in zip(spec.members, params["members"]):
        out.append(np.asarray(jax.jit(m_spec.apply)(m_params, X)))
    return np.stack(out)


def run_family(fam: int, ship: bool) -> dict:
    spec, params = load_pretrained(f"ensemble{fam}-stacked-mixed")
    splits = standard_splits(DATA, fam)
    aflw, biwi = splits["test_aflw2000"], splits["test_biwi"]
    _, val_ds = train_val_split(splits["train"], 0.2, 42)  # fit()'s split

    print(f"family {fam}: {len(spec.members)} members, "
          f"val {len(val_ds.poses)} rows (BIWI only), "
          f"aflw {len(aflw.poses)} UNTOUCHED test rows", flush=True)
    Pv = member_preds(spec, params, val_ds.features)
    Pa = member_preds(spec, params, aflw.features)
    Pb = member_preds(spec, params, biwi.features)

    yv = np.asarray(val_ds.poses)
    W, b, alpha = fit_with_cv(Pv, yv, np.ones(len(yv)), seed=fam)

    aflw_mae = mae(apply_stack(Pa, W, b), np.asarray(aflw.poses))
    biwi_mae = mae(apply_stack(Pb, W, b), np.asarray(biwi.poses))

    # VERDICT r4 item 6: is the 96-family collapse SAMPLE-starvation (329
    # val rows fitting members*3+3 weights — recovers with a small member
    # subset) or DOMAIN shift (BIWI labels cannot see the AFLW bias — no k
    # recovers)?  Rank members by their own val MAE (the selection signal
    # BIWI-only calibration legitimately has), refit the stack on top-k.
    ya, yb = np.asarray(aflw.poses), np.asarray(biwi.poses)
    per_val = np.array([mae(Pv[i], yv) for i in range(len(Pv))])
    order = np.argsort(per_val)
    topk = {}
    for k in (4, 8, 16, 32):
        if k >= len(Pv):
            continue
        sel = order[:k]
        Wk, bk, ak = fit_with_cv(Pv[sel], yv, np.ones(len(yv)),
                                 seed=fam * 100 + k)
        topk[str(k)] = {
            "aflw2000_mae_UNTOUCHED": mae(apply_stack(Pa[sel], Wk, bk), ya),
            "biwi_mae": mae(apply_stack(Pb[sel], Wk, bk), yb),
            "alpha": ak,
            "weights_fit": int(k * 3 + 1) * 3,
            "mean_member_val_mae": float(per_val[sel].mean()),
        }
        print(f"  top-{k}: AFLW {topk[str(k)]['aflw2000_mae_UNTOUCHED']:.3f}"
              f" (untouched)  BIWI {topk[str(k)]['biwi_mae']:.3f}  "
              f"alpha {ak}", flush=True)
    best_single = {
        "aflw2000_mae_UNTOUCHED": mae(Pa[order[0]], ya),
        "biwi_mae": mae(Pb[order[0]], yb),
        "member_val_mae": float(per_val[order[0]]),
    }

    # make k ITSELF val-selected (r5): nested split of the BIWI val rows —
    # fit per-k stacks on half A, choose k by MAE on half B (no AFLW label
    # touches the choice), refit the chosen k on the full val, and only
    # then score AFLW untouched.  If this still beats the reference, the
    # "beats it with zero AFLW supervision" claim is legitimate end to end.
    rng = np.random.default_rng(fam)
    perm = rng.permutation(len(yv))
    a_idx, b_idx = perm[:len(yv) // 2], perm[len(yv) // 2:]
    per_val_a = np.array([mae(Pv[i][a_idx], yv[a_idx])
                          for i in range(len(Pv))])
    order_a = np.argsort(per_val_a)
    k_grid = [k for k in (2, 4, 8, 16, 32) if k < len(Pv)]
    inner = {}
    for k in k_grid:
        sel = order_a[:k]
        Wk, bk, _ = fit_with_cv(Pv[sel][:, a_idx], yv[a_idx],
                                np.ones(len(a_idx)), seed=fam * 7 + k)
        inner[k] = mae(apply_stack(Pv[sel][:, b_idx], Wk, bk), yv[b_idx])
    k_star = min(inner, key=inner.get)
    sel = order[:k_star]                      # rank on the FULL val, top-k*
    Wf, bf, af = fit_with_cv(Pv[sel], yv, np.ones(len(yv)),
                             seed=fam * 11 + k_star)
    aflw_sel = mae(apply_stack(Pa[sel], Wf, bf), ya)
    val_selected = {
        "inner_val_mae_by_k": {str(k): float(v) for k, v in inner.items()},
        "k_selected_by_val": int(k_star),
        "aflw2000_mae_UNTOUCHED": aflw_sel,
        "biwi_mae": mae(apply_stack(Pb[sel], Wf, bf), yb),
        "alpha": af,
        "beats_reference_untouched": bool(aflw_sel < REFERENCE_AFLW[fam]),
    }
    print(f"  val-selected k={k_star} (inner "
          f"{ {k: round(v, 3) for k, v in inner.items()} }): AFLW "
          f"{val_selected['aflw2000_mae_UNTOUCHED']:.3f} untouched "
          f"(reference {REFERENCE_AFLW[fam]}), BIWI "
          f"{val_selected['biwi_mae']:.3f}", flush=True)
    shipped_aflw = mae(
        np.asarray(jax.jit(spec.apply)(params, aflw.features)),
        np.asarray(aflw.poses))
    row = {
        "calibration": "BIWI val split ONLY (zero AFLW supervision; "
                       "AFLW2000 is a true untouched test set)",
        "members": len(spec.members),
        "val_rows": int(len(yv)),
        "alpha": alpha,
        "aflw2000_mae_UNTOUCHED": aflw_mae,
        "biwi_mae": biwi_mae,
        "reference_production_aflw": REFERENCE_AFLW[fam],
        "beats_reference_untouched": bool(aflw_mae < REFERENCE_AFLW[fam]),
        "shipped_stack_aflw_in_sample_for_context": shipped_aflw,
        "topk_by_val": topk,
        "best_single_by_val": best_single,
        "val_selected_k": val_selected,
    }
    print(f"  biwi-only stack: AFLW {aflw_mae:.3f} (untouched; reference "
          f"{REFERENCE_AFLW[fam]}), BIWI {biwi_mae:.3f}  alpha {alpha}",
          flush=True)

    if ship:
        ens = EnsembleHead(
            members=spec.members,
            weights=tuple(tuple(float(w) for w in r) for r in W),
            bias=tuple(float(v) for v in b))
        got = np.asarray(jax.jit(ens.apply)({"members": params["members"]},
                                            aflw.features))
        assert abs(mae(got, np.asarray(aflw.poses)) - aflw_mae) < 1e-3
        out = os.path.join(os.path.dirname(_HERE), "headpose_tpu",
                           "pretrained_models", f"ensemble{fam}-biwi-only")
        save_model(out, ens, {"members": params["members"]}, metadata={
            "built_by": "scripts/stack_biwi_only.py",
            "quality": "trained-here",
            "provenance": (
                "the ensemble{}-stacked-mixed member pool with combination "
                "weights ridge-fit on the BIWI val split ONLY — zero AFLW "
                "supervision; the quoted AFLW MAE is a true untouched-test "
                "number".format(fam)),
            "metrics": {"aflw2000_mae_UNTOUCHED": aflw_mae,
                        "biwi_mae": biwi_mae},
        })
        row["shipped"] = os.path.basename(out)
        print(f"  shipped {out}", flush=True)
    return row


def main() -> None:
    ship = "--ship" in sys.argv
    merged = json.load(open(RESULT)) if os.path.exists(RESULT) else {}
    for fam in (88, 96):
        merged[f"family{fam}_biwi_only"] = run_family(fam, ship)
        json.dump(merged, open(RESULT, "w"), indent=1)
    print("wrote", RESULT)


if __name__ == "__main__":
    main()
