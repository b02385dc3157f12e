"""Certify the serving stack on the BOUNDARY-stress corpus, per axis.

Runs over tests/golden/stress_corpus.npz (make_stress_corpus.py: threshold-
straddling scores, NMS-boundary IoU~0.3 clusters, >=20-target saturation —
the three axes where float-mode divergence would first flip a detection set)
and reports set-agreement + error distributions PER AXIS for:

  * every precision mode of the flagship detector (highest/fast/turbo/max),
  * the fused Pallas postprocess variant of the parity modes,
  * the TFLite edge pipeline (EdgeDetector: numpy preprocess + TFLite
    invoke + C++ postprocess) — CPU,
  * the AOT serving artifact (tools/aot.py export of the 'fast' detector).

Merges a "stress" section into docs/certification.json (sha-pinned to the
stress corpus).  Run on the real chip:

    python scripts/certify_stress.py                (modes+pallas+AOT, chip)
    python scripts/certify_stress.py --only-tflite  (edge pipeline, CPU)
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = os.path.join(REPO, "tests", "golden", "stress_corpus.npz")
OUT = os.path.join(REPO, "docs", "certification.json")

MODES = ("highest", "fast", "turbo", "max")
AXES = ("threshold", "nms", "saturation")


def per_axis_report(data, per_img) -> dict:
    from certify_modes import dist, match_image

    axes = data["axis"]
    report = {}
    for axis in AXES:
        idxs = np.where(axes == axis)[0]
        pose_errs, box_errs, score_errs, agree = [], [], [], 0
        for i in idxs:
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
                score_errs.append(abs(float(ref["scores"][ri])
                                      - float(ours["scores"][oi])))
        report[axis] = {
            "images": int(len(idxs)),
            "set_agreement": agree / len(idxs),
            "agree_images": int(agree),
            "pose_deg": dist(np.asarray(pose_errs)),
            "box_norm": dist(np.asarray(box_errs)),
            "score": dist(np.asarray(score_errs)),
        }
    return report


def summarize(tag: str, rep: dict) -> None:
    parts = []
    for axis in AXES:
        r = rep[axis]
        p = r["pose_deg"]
        parts.append(f"{axis} {r['agree_images']}/{r['images']} "
                     f"(pose max {p.get('max', 0):.2g})")
    print(f"{tag:>22}: " + "; ".join(parts), flush=True)


def merge(sha: str, base: dict, section: str, payload: dict) -> None:
    """Incremental merge: each section lands as soon as it's computed, and a
    corpus change invalidates previously merged sections."""
    cert = json.load(open(OUT)) if os.path.exists(OUT) else {}
    stress = cert.get("stress", {})
    if stress.get("corpus_sha256") != sha:
        stress = dict(base)
    stress[section] = payload
    cert["stress"] = stress
    with open(OUT, "w") as f:
        json.dump(cert, f, indent=1)


def main() -> None:
    # default: precision modes + pallas postprocess + AOT (run on the chip).
    # --only-tflite: the edge pipeline alone, on a FORCED-CPU jax (the
    # export gate's reference forward must be f32-exact, not TPU bf16) —
    # run it as a second invocation.
    only_tflite = "--only-tflite" in sys.argv
    skip_aot = "--skip-aot" in sys.argv

    import jax

    if only_tflite:
        jax.config.update("jax_platforms", "cpu")

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector

    data = dict(np.load(CORPUS))
    sha = hashlib.sha256(open(CORPUS, "rb").read()).hexdigest()
    imgs = data["imgs"]
    model, params = load_flagship()

    base = {
        "corpus": os.path.relpath(CORPUS, REPO),
        "corpus_sha256": sha,
        "images": int(len(imgs)),
        "reference_detections": int(data["counts"].sum()),
        "backend": jax.devices()[0].platform,
        "axes": {a: int((data["axis"] == a).sum()) for a in AXES},
    }

    if only_tflite:
        from headpose_tpu.runtime.edge import EdgeDetector
        from headpose_tpu.tools.tflite import export_unified_tflite

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "flagship.tflite")
            export_unified_tflite(model, params, path)
            edge = EdgeDetector(path)   # production thresholds
            per_img = [edge.detect_single(im) for im in imgs]
        rep = per_axis_report(data, per_img)
        merge(sha, base, "tflite_edge", rep)
        summarize("tflite_edge", rep)
        print("wrote", OUT)
        return

    modes = {}
    for mode in MODES:
        det = FaceDetector(model, params, score_threshold=0.4,
                           iou_threshold=0.3, precision=mode)
        per_img = det.detect(imgs).trim()
        modes[mode] = per_axis_report(data, per_img)
        merge(sha, base, "modes", modes)
        summarize(mode, modes[mode])

    # fused Pallas postprocess, parity modes only (bit-exact vs XLA by
    # construction — this PROVES it on boundary-stressing sets)
    pallas = {}
    for mode in ("highest", "fast"):
        try:
            det = FaceDetector(model, params, score_threshold=0.4,
                               iou_threshold=0.3, precision=mode,
                               postprocess="pallas")
            per_img = det.detect(imgs).trim()
            pallas[mode] = per_axis_report(data, per_img)
            merge(sha, base, "modes_pallas_postprocess", pallas)
            summarize(f"pallas/{mode}", pallas[mode])
        except Exception as e:   # CPU hosts: Mosaic kernels are TPU-only
            print(f"pallas postprocess skipped ({type(e).__name__}: {e})")
            break

    if not skip_aot:
        from headpose_tpu.tools.aot import export_detector, load_exported

        det = FaceDetector(model, params, score_threshold=0.4,
                           iou_threshold=0.3, precision="fast")
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "fast.aot")
            export_detector(det, path, batch_sizes=(len(imgs),),
                            image_shape=imgs.shape[1:3])
            per_img = load_exported(path).detect(imgs).trim()
        rep = per_axis_report(data, per_img)
        merge(sha, base, "aot_fast", rep)
        summarize("aot_fast", rep)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
