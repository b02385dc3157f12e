"""Certify the edge pipeline end-to-end FROM CAMERA-SIZED FRAMES.

The reference's detectFaces owns the resize of arbitrary camera frames (TF
bicubic, blazeFaceDetectorH5.py:247-269).  Round 3's edge certification ran
only at the native 128; round 4 gave EdgeDetector the TF-exact bicubic
(ops/bicubic.py) so camera frames are first-class — this script proves it
against the REFERENCE pipeline itself: the same 480x480 and 333x333 frames
(333: off the 1/1024 phase grid, exercising TF's quantized coefficient
table) go through

  * the reference detectFaces (tf-keras, owns its resize) -> goldens,
  * EdgeDetector (numpy bicubic + TFLite invoke + C++ postprocess),
  * FaceDetector 'highest' (JAX GEMM bicubic) as the cross-check,

and detection sets + error distributions are compared per size.  Merges a
"resize" section into docs/tflite_certification.json.  CPU-runnable:

    python scripts/certify_edge_resize.py
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, _HERE)

CORPUS = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")
OUT = os.path.join(REPO, "docs", "tflite_certification.json")

SIZES = (480, 333)
N_IMAGES = 40     # tf-keras detectFaces is a per-frame python loop — keep
                  # the reference capture tractable (2 sizes x 40 frames)


def upscale(imgs: np.ndarray, size: int) -> np.ndarray:
    """Nearest-neighbour 4x upscale then crop — synthesizes the camera
    frame; BOTH pipelines then own the downsize back to 128."""
    up = np.repeat(np.repeat(imgs, 4, axis=1), 4, axis=2)
    return np.ascontiguousarray(up[:, :size, :size])


def report_against(results, per_img) -> dict:
    from certify_modes import dist, match_image

    pose_errs, box_errs, score_errs, agree = [], [], [], 0
    for r, ours in zip(results, per_img):
        ref = {"boxes": np.asarray(r.boxes, np.float32),
               "scores": np.asarray(r.scores, np.float32),
               "poses": np.asarray(r.poses, np.float32)}
        got = {"boxes": np.asarray(ours.boxes, np.float32),
               "scores": np.asarray(ours.scores, np.float32),
               "poses": np.asarray(ours.poses, np.float32)}
        pairs, full = match_image(ref, got)
        agree += full
        for ri, oi in pairs:
            pose_errs.append(np.abs(ref["poses"][ri] - got["poses"][oi]).max())
            box_errs.append(np.abs(ref["boxes"][ri] - got["boxes"][oi]).max())
            score_errs.append(abs(float(ref["scores"][ri])
                                  - float(got["scores"][oi])))
    return {"images": len(results), "agree_images": agree,
            "set_agreement": agree / len(results),
            "pose_deg": dist(np.asarray(pose_errs)),
            "box_norm": dist(np.asarray(box_errs)),
            "score": dist(np.asarray(score_errs))}


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from make_parity_corpus import capture_reference
    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.runtime.edge import EdgeDetector
    from headpose_tpu.tools.tflite import export_unified_tflite

    imgs128 = np.load(CORPUS)["imgs"][:N_IMAGES]
    model, params = load_flagship()
    det = FaceDetector(model, params, score_threshold=0.4,
                       iou_threshold=0.3, precision="highest")

    section = {"what": "camera-sized frames through the reference's FULL "
                       "detectFaces (which owns the TF bicubic resize) vs "
                       "the edge pipeline (numpy TF-exact bicubic + TFLite "
                       "+ C++ postprocess) and the JAX detector",
               "frames_per_size": N_IMAGES, "sizes": {}}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "flagship.tflite")
        export_unified_tflite(model, params, path)
        edge = EdgeDetector(path)   # production thresholds
        for size in SIZES:
            frames = upscale(imgs128, size)
            print(f"[{size}x{size}] capturing reference outputs "
                  f"(tf-keras detectFaces)...", flush=True)
            results, counts = capture_reference(frames)
            edge_res = [edge.detect_single(f) for f in frames]
            jax_res = det.detect(frames).trim()
            rep_e = report_against(results, edge_res)
            rep_j = report_against(results, jax_res)
            section["sizes"][str(size)] = {
                "reference_detections": int(counts.sum()),
                "edge_pipeline": rep_e,
                "jax_highest": rep_j,
            }
            for tag, rep in (("edge", rep_e), ("jax", rep_j)):
                p = rep["pose_deg"]
                print(f"[{size}x{size}] {tag}: set agreement "
                      f"{rep['agree_images']}/{rep['images']}, pose max "
                      f"{p.get('max', 0):.2g} deg", flush=True)

    cert = json.load(open(OUT)) if os.path.exists(OUT) else {}
    section["corpus_sha256"] = hashlib.sha256(
        open(CORPUS, "rb").read()).hexdigest()
    cert["resize"] = section
    with open(OUT, "w") as f:
        json.dump(cert, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
