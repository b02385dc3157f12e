"""Certify the TFLite edge deployment end-to-end on the parity corpus.

The per-tensor validation inside tools/tflite.py proves the flatbuffer
reproduces the JAX forward on one draw; this script proves what an edge
DEPLOYMENT delivers: the exported flagship artifact is run image-by-image
(batch 1, the edge shape) over the full 112-image parity-validation corpus
and its raw outputs go through the framework postprocess at PRODUCTION
settings (threshold 0.4, iou 0.3 — blazeFaceDetectorH5.py:82), then match
against the reference-pipeline goldens with the same set-agreement / error-
distribution machinery as the precision-mode certificate
(scripts/certify_modes.py).

Writes docs/tflite_certification.json (corpus-sha-pinned like
docs/certification.json; tests/test_tflite.py validates it).  CPU-runnable —
the TFLite interpreter is a host runtime; no chip involved:

    python scripts/certify_tflite.py
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")
OUT = os.path.join(REPO, "docs", "tflite_certification.json")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")  # host-side certification

    import jax.numpy as jnp

    from certify_modes import dist, match_image
    from headpose_tpu.models.anchors import FRONT_CONFIG, generate_anchors
    from headpose_tpu.ops.detection import postprocess
    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.tools.tflite import TFLiteModel, export_unified_tflite

    data = dict(np.load(CORPUS))
    n = len(data["imgs"])

    model, params = load_flagship()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "flagship.tflite")
        report = export_unified_tflite(model, params, path)
        tm = TFLiteModel(path)
        print(f"exported flagship: {report['bytes']} B, per-tensor maxerr "
              f"{max(report['maxerr'].values()):.2e}")

        # the edge pipeline: host preprocess -> per-image (batch 1) TFLite
        # invokes -> framework postprocess on the raw outputs
        pre = np.asarray(jax.jit(preprocess)(data["imgs"]))
        outs, lat = [], []
        for i in range(n):
            t0 = time.perf_counter()
            o = tm(image=pre[i:i + 1])
            lat.append(time.perf_counter() - t0)
            outs.append(o)

    scores = np.concatenate(
        [np.stack([o["cls_front"][0, :, 0] for o in outs]),
         np.stack([o["cls_back"][0, :, 0] for o in outs])], axis=1)
    loc = np.concatenate([np.stack([o["loc_front"][0] for o in outs]),
                          np.stack([o["loc_back"][0] for o in outs])], axis=1)
    pose_f = np.stack([o["pose_front"][0] for o in outs])
    pose_b = np.stack([o["pose_back"][0] for o in outs])

    anchors = jnp.asarray(generate_anchors(FRONT_CONFIG))
    post = jax.jit(jax.vmap(
        lambda s, l, pf, pb: postprocess(s, l, pf, pb, anchors,
                                         score_threshold=0.4,
                                         iou_threshold=0.3)))
    res = jax.tree.map(np.asarray,
                       post(jnp.asarray(scores), jnp.asarray(loc),
                            jnp.asarray(pose_f), jnp.asarray(pose_b)))

    pose_errs, box_errs, score_errs, agree = [], [], [], 0
    for i in range(n):
        c = int(data["counts"][i])
        k = int(res["valid"][i].sum())
        ref = {"boxes": data["boxes"][i, :c],
               "scores": data["scores"][i, :c],
               "poses": data["poses"][i, :c]}
        ours = {"boxes": res["boxes"][i, :k], "scores": res["scores"][i, :k],
                "poses": res["poses"][i, :k]}
        pairs, full = match_image(ref, ours)
        agree += full
        for ri, oi in pairs:
            pose_errs.append(np.abs(ref["poses"][ri] - ours["poses"][oi]).max())
            box_errs.append(np.abs(ref["boxes"][ri] - ours["boxes"][oi]).max())
            score_errs.append(abs(float(ref["scores"][ri])
                                  - float(ours["scores"][oi])))

    cert = {
        "what": "flagship unified TFLite artifact, batch-1 invokes + "
                "framework postprocess at production settings, vs the "
                "reference-pipeline goldens",
        "corpus_sha256": hashlib.sha256(open(CORPUS, "rb").read()).hexdigest(),
        "artifact_bytes": report["bytes"],
        "per_tensor_maxerr": report["maxerr"],
        "images": n,
        "set_agreement": agree / n,
        "pose_deg": dist(np.asarray(pose_errs)),
        "box_norm": dist(np.asarray(box_errs)),
        "score": dist(np.asarray(score_errs)),
        "host_invoke_ms": {"p50": float(np.percentile(lat, 50) * 1e3),
                           "note": "this build host's CPU via XNNPACK — an "
                                   "edge-device number needs the edge device"},
    }
    with open(OUT, "w") as f:
        json.dump(cert, f, indent=1)
    p = cert["pose_deg"]
    print(f"set agreement {agree}/{n}; pose err deg p50 {p['p50']:.2e} "
          f"p99 {p['p99']:.2e} max {p['max']:.2e}  ({p['n']} matched); "
          f"host invoke p50 {cert['host_invoke_ms']['p50']:.2f} ms")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
