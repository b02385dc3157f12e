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

    python scripts/certify_stress.py                  (~6 compiles)
    python scripts/certify_stress.py --skip-aot       (modes + tflite only)
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


def main() -> None:
    import jax

    skip_aot = "--skip-aot" in sys.argv
    skip_tflite = "--skip-tflite" in sys.argv

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector

    data = dict(np.load(CORPUS))
    sha = hashlib.sha256(open(CORPUS, "rb").read()).hexdigest()
    imgs = data["imgs"]
    model, params = load_flagship()

    stress = {
        "corpus": os.path.relpath(CORPUS, REPO),
        "corpus_sha256": sha,
        "images": int(len(imgs)),
        "reference_detections": int(data["counts"].sum()),
        "backend": jax.devices()[0].platform,
        "axes": {a: int((data["axis"] == a).sum()) for a in AXES},
        "modes": {},
    }

    for mode in MODES:
        det = FaceDetector(model, params, score_threshold=0.4,
                           iou_threshold=0.3, precision=mode)
        per_img = det.detect(imgs).trim()
        stress["modes"][mode] = per_axis_report(data, per_img)
        summarize(mode, stress["modes"][mode])

    # fused Pallas postprocess, parity modes only (bit-exact vs XLA by
    # construction — this PROVES it on boundary-stressing sets)
    stress["modes_pallas_postprocess"] = {}
    for mode in ("highest", "fast"):
        try:
            det = FaceDetector(model, params, score_threshold=0.4,
                               iou_threshold=0.3, precision=mode,
                               postprocess="pallas")
            per_img = det.detect(imgs).trim()
            stress["modes_pallas_postprocess"][mode] = \
                per_axis_report(data, per_img)
            summarize(f"pallas/{mode}", stress["modes_pallas_postprocess"][mode])
        except Exception as e:   # CPU hosts: Mosaic kernels are TPU-only
            print(f"pallas postprocess skipped ({type(e).__name__}: {e})")
            stress.pop("modes_pallas_postprocess", None)
            break

    if not skip_tflite:
        from headpose_tpu.runtime.edge import EdgeDetector
        from headpose_tpu.tools.tflite import export_unified_tflite

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "flagship.tflite")
            export_unified_tflite(model, params, path)
            edge = EdgeDetector(path)   # production thresholds
            per_img = [edge.detect_single(im) for im in imgs]
        stress["tflite_edge"] = per_axis_report(data, per_img)
        summarize("tflite_edge", stress["tflite_edge"])

    if not skip_aot:
        from headpose_tpu.tools.aot import export_detector, load_exported

        det = FaceDetector(model, params, score_threshold=0.4,
                           iou_threshold=0.3, precision="fast")
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "fast.aot")
            export_detector(det, path, batch_sizes=(len(imgs),),
                            image_shape=imgs.shape[1:3])
            per_img = load_exported(path).detect(imgs).trim()
        stress["aot_fast"] = per_axis_report(data, per_img)
        summarize("aot_fast", stress["aot_fast"])

    cert = json.load(open(OUT)) if os.path.exists(OUT) else {}
    cert["stress"] = stress
    with open(OUT, "w") as f:
        json.dump(cert, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
