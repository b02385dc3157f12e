"""Certify every serving precision mode on the parity-validation corpus.

Runs the flagship detector in each mode (highest / fast / turbo / max) over
tests/golden/parity_corpus.npz (~112 detection-rich images, 451 reference
detections captured from the reference pipeline at production threshold 0.4 —
see make_parity_corpus.py) and reports per-mode DISTRIBUTIONS:

  * detection-set agreement: fraction of images whose detection count matches
    and whose every reference detection is matched by ours at box-IoU > 0.5
  * pose error (deg): per matched detection, max |delta| over yaw/pitch/roll;
    p50 / p90 / p99 / max over all matched detections
  * box / score error distributions likewise

Writes docs/certification.json (with the corpus sha256, so
tests/test_certification.py can detect a stale certificate) — the evidence
behind the 'fast'/'turbo' parity-budget claims (VERDICT r2 item 1; budget:
BASELINE.md, MAE within 0.1 deg).

Run on the real chip:  python scripts/certify_modes.py      (~5 min: 4 modes
x 1 tunnel compile each)
"""
from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
CORPUS = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")
OUT = os.path.join(REPO, "docs", "certification.json")

MODES = ("highest", "fast", "turbo", "max")
IOU_MATCH = 0.5


def box_iou(a: np.ndarray, b: np.ndarray) -> float:
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
    ua = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
    ub = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
    return inter / (ua + ub - inter) if ua + ub - inter > 0 else 0.0


def match_image(ref, ours):
    """Greedy one-to-one match of reference detections to ours by IoU.
    Returns (pairs [(ri, oi)], fully_matched: bool)."""
    used, pairs = set(), []
    for ri in range(len(ref["scores"])):
        best, best_iou = None, IOU_MATCH
        for oi in range(len(ours["scores"])):
            if oi in used:
                continue
            iou = box_iou(ref["boxes"][ri], ours["boxes"][oi])
            if iou > best_iou:
                best, best_iou = oi, iou
        if best is not None:
            used.add(best)
            pairs.append((ri, best))
    full = (len(pairs) == len(ref["scores"])
            and len(ours["scores"]) == len(ref["scores"]))
    return pairs, full


def dist(errs: np.ndarray) -> dict:
    if len(errs) == 0:
        return {"n": 0}
    return {"n": int(len(errs)),
            "p50": float(np.percentile(errs, 50)),
            "p90": float(np.percentile(errs, 90)),
            "p99": float(np.percentile(errs, 99)),
            "max": float(errs.max())}


def certify(detector_factory, data, modes=None) -> dict:
    import jax

    n = len(data["imgs"])
    report = {}
    for mode in (MODES if modes is None else modes):
        det = detector_factory(mode)
        batch = det.detect(data["imgs"])       # one jitted program, batch n
        jax.block_until_ready(batch.scores)
        per_img = batch.trim()

        pose_errs, box_errs, score_errs = [], [], []
        agree = 0
        for i in range(n):
            c = int(data["counts"][i])
            ref = {"boxes": data["boxes"][i, :c],
                   "scores": data["scores"][i, :c],
                   "poses": data["poses"][i, :c]}
            ours = {"boxes": np.asarray(per_img[i].boxes, np.float32),
                    "scores": np.asarray(per_img[i].scores, np.float32),
                    "poses": np.asarray(per_img[i].poses, np.float32)}
            pairs, full = match_image(ref, ours)
            agree += full
            for ri, oi in pairs:
                pose_errs.append(
                    np.abs(ref["poses"][ri] - ours["poses"][oi]).max())
                box_errs.append(
                    np.abs(ref["boxes"][ri] - ours["boxes"][oi]).max())
                score_errs.append(
                    abs(float(ref["scores"][ri]) - float(ours["scores"][oi])))
        report[mode] = {
            "set_agreement": agree / n,
            "images": n,
            "pose_deg": dist(np.asarray(pose_errs)),
            "box_norm": dist(np.asarray(box_errs)),
            "score": dist(np.asarray(score_errs)),
        }
        p = report[mode]["pose_deg"]
        print(f"{mode:>8}: set agreement {agree}/{n}, pose error deg "
              f"p50 {p.get('p50', 0):.4g} p99 {p.get('p99', 0):.4g} "
              f"max {p.get('max', 0):.4g}  ({p['n']} matched)")
    return report


def main():
    # usage: certify_modes.py [--postprocess pallas] [mode ...]
    # with --postprocess pallas, results are MERGED into the existing
    # certificate under "modes_pallas_postprocess" (the primary 4-mode
    # XLA-postprocess certificate is left untouched)
    import jax

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector

    args = sys.argv[1:]
    postprocess = "xla"
    if "--postprocess" in args:
        i = args.index("--postprocess")
        if i + 1 >= len(args):
            raise SystemExit("--postprocess needs a value: xla | pallas")
        postprocess = args[i + 1]
        del args[i:i + 2]
    modes = tuple(args) or None

    data = dict(np.load(CORPUS))
    sha = hashlib.sha256(open(CORPUS, "rb").read()).hexdigest()
    partial = not (postprocess == "xla" and modes is None)
    if partial:
        # partial runs MERGE into the primary certificate — check it exists
        # and matches this corpus BEFORE the expensive certification, not
        # after (and not via `assert`, which python -O strips)
        if not os.path.exists(OUT):
            raise SystemExit(
                f"{OUT} does not exist — run the full certification first "
                "(no flags), then merge partial/pallas runs into it")
        if json.load(open(OUT)).get("corpus_sha256") != sha:
            raise SystemExit("corpus changed since the primary certificate "
                             "— run the full certification first")
    model, params = load_flagship()

    def factory(mode):
        return FaceDetector(model, params, score_threshold=0.4,
                            iou_threshold=0.3, precision=mode,
                            postprocess=postprocess)

    report = certify(factory, data, modes)
    if postprocess == "xla" and modes is None:
        out = {
            "corpus": os.path.relpath(CORPUS, REPO),
            "corpus_sha256": sha,
            "images": int(len(data["imgs"])),
            "reference_detections": int(data["counts"].sum()),
            "backend": jax.devices()[0].platform,
            "modes": report,
        }
        # a full re-certification must not silently delete previously
        # merged sections (e.g. modes_pallas_postprocess) if the corpus is
        # unchanged
        if os.path.exists(OUT):
            prev = json.load(open(OUT))
            if prev.get("corpus_sha256") == sha:
                for k, v in prev.items():
                    out.setdefault(k, v)
    else:
        out = json.load(open(OUT))   # existence/sha guarded before certify
        key = ("modes_pallas_postprocess" if postprocess == "pallas"
               else "modes_partial")
        out.setdefault(key, {}).update(report)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
