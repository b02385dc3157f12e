"""Certify the serving stack on the BOUNDARY-stress corpus, per axis.

Runs over tests/golden/stress_corpus.npz (make_stress_corpus.py: threshold-
straddling scores, NMS-boundary IoU~0.3 clusters, >=20-target saturation,
and >100-survivor MAX_FACE_NUM overflow — the axes where float-mode
divergence or the fixed-slab contract would first flip a detection set)
and reports set-agreement + error distributions PER AXIS for:

  * every precision mode of the flagship detector (highest/fast/turbo/max),
  * the fused Pallas postprocess variant of the parity modes,
  * the TFLite edge pipeline (EdgeDetector: numpy preprocess + TFLite
    invoke + C++ postprocess) — CPU,
  * the AOT serving artifact (tools/aot.py export of the 'fast' detector),
  * THE SERVED DEFAULT — best_detector() ('unified-best-distilled') under
    its resolved profile, in default + 'fast' precision, AND through the
    chunked >128-batch path (VERDICT r4 item 1: the gate must certify the
    artifact users load, not only its ancestor).  Detection sets/boxes/
    scores must be identical to the flagship rows; poses are the distilled
    heads' INTENTIONAL improvement and are recorded, not parity-gated.

Overflow-axis extras (VERDICT r4 item 2, MAX_FACE_NUM=100 truncation,
blazeFaceDetectorH5.py:8-9,332):
  * per-section "overflow order": survivor IDENTITY AND EMISSION ORDER at
    the cap must match the reference's tf.image.non_max_suppression
    truncation elementwise (both sides emit greedy score-descending).
  * "overflow_uncapped": the same images served with max_faces=256 must
    reproduce the reference's UNCAPPED survivor sets (captured with
    MAX_FACE_NUM monkeypatched to 896) — proving cap agreement is not
    vacuous: both sides agree on the >100-survivor set AND on where its
    top-100 prefix is cut.

Merges a "stress" section into docs/certification.json (sha-pinned to the
stress corpus).  Run on the real chip:

    python scripts/certify_stress.py                (modes+pallas+AOT+best, chip)
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
AXES = ("threshold", "nms", "saturation", "overflow")


def full_report(data, per_img, score_tol=1e-3) -> dict:
    """Per-axis set-agreement/error report + the overflow truncation-order
    check (one payload per certified section)."""
    rep = per_axis_report(data, per_img)
    rep["overflow_order"] = overflow_order_report(data, per_img, score_tol)
    return rep


def per_axis_report(data, per_img) -> dict:
    from certify_modes import dist, match_image

    axes = data["axis"]
    report = {}
    for axis in AXES:
        idxs = np.where(axes == axis)[0]
        if len(idxs) == 0:
            continue
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


def order_check(ref_boxes, ref_scores, ours, c, score_tol=1e-3):
    """Does `ours` reproduce the reference's first c detections at the SAME
    POSITIONS (greedy-NMS emission order)?  Elementwise, not greedy-matched:
    position i must agree on box (IoU > 0.5) and score (|delta| < tol)."""
    from certify_modes import box_iou

    ob = np.asarray(ours.boxes, np.float32)
    os_ = np.asarray(ours.scores, np.float32)
    if len(os_) < c:
        return False
    return all(box_iou(ref_boxes[i], ob[i]) > 0.5
               and abs(float(ref_scores[i]) - float(os_[i])) < score_tol
               for i in range(c))


def overflow_order_report(data, per_img, score_tol=1e-3) -> dict:
    """Per-image truncation-order agreement on the overflow axis: survivor
    identity AND emission order at the MAX_FACE_NUM cap must match the
    reference's tf NMS truncation elementwise."""
    idxs = np.where(data["axis"] == "overflow")[0]
    ok = sum(order_check(data["boxes"][i], data["scores"][i], per_img[i],
                         int(data["counts"][i]), score_tol)
             for i in idxs)
    return {"images": int(len(idxs)), "order_exact": int(ok),
            "capped_images": int((data["counts"][idxs] == 100).sum())}


def summarize(tag: str, rep: dict) -> None:
    parts = []
    for axis in AXES:
        if axis not in rep:
            continue
        r = rep[axis]
        p = r["pose_deg"]
        parts.append(f"{axis} {r['agree_images']}/{r['images']} "
                     f"(pose max {p.get('max', 0):.2g})")
    if "overflow_order" in rep:
        o = rep["overflow_order"]
        parts.append(f"order {o['order_exact']}/{o['images']}")
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
            rep = full_report(data, per_img)
            # C++ postprocess UNCAPPED: the native greedy NMS must also
            # reproduce the reference's full >100-survivor sets (proving
            # its truncation at max_faces is a genuine order match)
            if "ov_idx" in data:
                edge256 = EdgeDetector(path, max_faces=256)
                ov = [edge256.detect_single(imgs[i]) for i in data["ov_idx"]]
                ov_ref = {"axis": np.array(["overflow"] * len(ov)),
                          "counts": data["ov_counts"],
                          "boxes": data["ov_boxes"],
                          "scores": data["ov_scores"],
                          "poses": data["ov_poses"]}
                unc = per_axis_report(ov_ref, ov)["overflow"]
                unc["count_match"] = int(sum(
                    len(ov[i]) == int(data["ov_counts"][i])
                    for i in range(len(ov))))
                unc["order"] = overflow_order_report(ov_ref, ov)
                rep["overflow_uncapped"] = unc
                print(f"  edge uncapped: sets {unc['agree_images']}/"
                      f"{unc['images']}, counts {unc['count_match']}/"
                      f"{unc['images']}, order "
                      f"{unc['order']['order_exact']}/{unc['images']}",
                      flush=True)
        merge(sha, base, "tflite_edge", rep)
        summarize("tflite_edge", rep)
        print("wrote", OUT)
        return

    modes = {}
    for mode in MODES:
        det = FaceDetector(model, params, score_threshold=0.4,
                           iou_threshold=0.3, precision=mode)
        per_img = det.detect(imgs).trim()
        modes[mode] = full_report(data, per_img)
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
            pallas[mode] = full_report(data, per_img)
            merge(sha, base, "modes_pallas_postprocess", pallas)
            summarize(f"pallas/{mode}", pallas[mode])
        except Exception as e:   # CPU hosts: Mosaic kernels are TPU-only
            print(f"pallas postprocess skipped ({type(e).__name__}: {e})")
            break

    # the reference's UNCAPPED survivor sets (MAX_FACE_NUM -> 896 capture):
    # serving the overflow images with max_faces=256 must reproduce them —
    # proving both sides agree on the FULL >100-survivor set, so agreement
    # at the cap is a genuine truncation-order match, not a coincidence
    if "ov_idx" in data:
        unc = {}
        ov_imgs = imgs[data["ov_idx"]]
        ov_ref = {"axis": np.array(["overflow"] * len(ov_imgs)),
                  "counts": data["ov_counts"], "boxes": data["ov_boxes"],
                  "scores": data["ov_scores"], "poses": data["ov_poses"]}
        for mode in ("highest", "fast"):
            det = FaceDetector(model, params, score_threshold=0.4,
                               iou_threshold=0.3, precision=mode,
                               max_faces=256)
            per_img = det.detect(ov_imgs).trim()
            rep = per_axis_report(ov_ref, per_img)["overflow"]
            rep["count_match"] = int(sum(
                len(per_img[i]) == int(data["ov_counts"][i])
                for i in range(len(ov_imgs))))
            rep["order"] = overflow_order_report(ov_ref, per_img)
            rep["max_uncapped_survivors"] = int(data["ov_counts"].max())
            unc[mode] = rep
            merge(sha, base, "overflow_uncapped", unc)
            print(f"  uncapped/{mode}: sets {rep['agree_images']}/"
                  f"{rep['images']}, counts {rep['count_match']}/"
                  f"{rep['images']}, order "
                  f"{rep['order']['order_exact']}/{rep['images']}",
                  flush=True)

    # THE SERVED DEFAULT: best_detector() — the artifact users load.
    # Detections must be identical to the flagship rows (same imported
    # backbone); poses are the distilled frontier's intentional improvement
    # over the reference heads (recorded, gated only for sanity).
    from headpose_tpu.pretrained import BEST, best_detector

    bestsec = {}
    for tag, kwargs in (
            ("default", {}),                       # resolved serving profile
            ("fast", {"precision": "fast"})):
        det = best_detector(score_threshold=0.4, iou_threshold=0.3, **kwargs)
        per_img = det.detect(imgs).trim()
        rep = full_report(data, per_img)
        rep["resolved_profile"] = {
            "artifact": BEST, "precision": det.precision,
            "head_eval": det.head_eval, "postprocess": det.postprocess,
            "max_faces": det.max_faces}
        bestsec[tag] = rep
        merge(sha, base, "best_detector", bestsec)
        summarize(f"best/{tag}", rep)

    # the chunked >128-batch serving path (_pipeline splits into 128-lane
    # branches inside one jit): serve the corpus duplicated past the chunk
    # boundary; the first copy must equal the unchunked run ROW FOR ROW and
    # certify identically
    det = best_detector(score_threshold=0.4, iou_threshold=0.3,
                        precision="fast")
    n = len(imgs)
    wide = np.concatenate([imgs, imgs])           # 2n > 128 images
    batch = det.detect(wide)
    per_img = batch.trim()
    rep = full_report(data, per_img[:n])
    mism = 0
    for i in range(n):
        a, b = per_img[i], per_img[n + i]
        if (len(a) != len(b)
                or not np.array_equal(np.asarray(a.scores),
                                      np.asarray(b.scores))
                or not np.array_equal(np.asarray(a.boxes),
                                      np.asarray(b.boxes))
                or not np.array_equal(np.asarray(a.poses),
                                      np.asarray(b.poses))):
            mism += 1
    rep["batch"] = int(len(wide))
    rep["duplicate_halves_bitwise_equal"] = mism == 0
    bestsec["fast_chunked_gt128"] = rep
    merge(sha, base, "best_detector", bestsec)
    summarize("best/chunked", rep)
    print(f"  chunked halves bitwise-equal: {mism == 0}", flush=True)

    if not skip_aot:
        from headpose_tpu.tools.aot import export_detector, load_exported

        det = FaceDetector(model, params, score_threshold=0.4,
                           iou_threshold=0.3, precision="fast")
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "fast.aot")
            export_detector(det, path, batch_sizes=(len(imgs),),
                            image_shape=imgs.shape[1:3])
            per_img = load_exported(path).detect(imgs).trim()
        rep = full_report(data, per_img)
        merge(sha, base, "aot_fast", rep)
        summarize("aot_fast", rep)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
