"""Capture golden outputs from the reference implementation for parity tests.

Runs the reference Keras-H5 artifacts (mounted read-only at /root/reference) via
tf-keras and stores small npz fixtures under tests/golden/.  These fixtures are
committed so the test suite never needs TensorFlow or the reference mount.

Reference behaviours captured (file:line cites refer to /root/reference):
  * SSD anchor table        — BlazePoser/blazeFaceUtils.py:59-127
  * Unified model forward   — BlazePoser/UnifiedModels/reg1-stoqa9pt-reg2-hrchr82r-selected.h5
  * Bicubic preprocessing   — BlazePoser/blazeFaceDetectorH5.py:247-269
  * Head predictions        — Model-88/Trained-Models-88/stoqa9pt.h5,
                              Model-96/Trained-Models-96-ReshapedInput-NoFlatten/hrchr82r.h5
  * Post-process pipeline   — BlazePoser/blazeFaceDetectorH5.py:284-357
"""
import os
import sys
import json

import numpy as np

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

sys.path.insert(0, os.path.join(REF, "BlazePoser"))

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import tf_keras as keras  # legacy Keras-2 loader; stock Keras 3 cannot read these H5s
import tensorflow as tf


def capture_anchors():
    from blazeFaceUtils import gen_anchors, SsdAnchorsCalculatorOptions

    opts = SsdAnchorsCalculatorOptions(
        input_size_width=128, input_size_height=128,
        min_scale=0.1484375, max_scale=0.75,
        anchor_offset_x=0.5, anchor_offset_y=0.5, num_layers=4,
        feature_map_width=[], feature_map_height=[],
        strides=[8, 16, 16, 16], aspect_ratios=[1.0],
        reduce_boxes_in_lowest_layer=False,
        interpolated_scale_aspect_ratio=1.0,
        fixed_anchor_size=True,
    )
    anchors = gen_anchors(opts)
    arr = np.array([[a.x_center, a.y_center, a.w, a.h] for a in anchors], np.float64)
    np.savez_compressed(os.path.join(OUT, "anchors.npz"), anchors=arr)
    print("anchors:", arr.shape)


def capture_unified_forward():
    path = os.path.join(REF, "BlazePoser/UnifiedModels/reg1-stoqa9pt-reg2-hrchr82r-selected.h5")
    model = keras.models.load_model(path, compile=False)
    rng = np.random.default_rng(0)
    xs = rng.uniform(-1.0, 1.0, size=(4, 1, 128, 128, 3)).astype(np.float32)
    outs = {f"out{i}": [] for i in range(6)}
    for x in xs:
        ys = model(x)
        for i, y in enumerate(ys):
            outs[f"out{i}"].append(np.asarray(y)[0])
    np.savez_compressed(
        os.path.join(OUT, "unified_forward.npz"),
        inputs=xs[:, 0],
        **{k: np.stack(v) for k, v in outs.items()},
    )
    print("unified forward captured")
    return model


def capture_resize():
    rng = np.random.default_rng(1)
    fixtures = {}
    for i, (h, w) in enumerate([(160, 160), (271, 313), (480, 640)]):
        img = rng.integers(0, 256, size=(h, w, 3)).astype(np.float64) / 255.0
        # exact preprocessing of blazeFaceDetectorH5.py:254-263
        resized = tf.image.resize(img, [128, 128], method="bicubic").numpy()
        fixtures[f"img{i}"] = img.astype(np.float32)
        fixtures[f"resized{i}"] = resized.astype(np.float32)
    np.savez_compressed(os.path.join(OUT, "resize_bicubic.npz"), **fixtures)
    print("resize goldens captured")


def capture_heads():
    rng = np.random.default_rng(2)
    fixtures = {}
    m88 = keras.models.load_model(
        os.path.join(REF, "Model-88/Trained-Models-88/stoqa9pt.h5"), compile=False)
    m96 = keras.models.load_model(
        os.path.join(REF, "Model-96/Trained-Models-96-ReshapedInput-NoFlatten/hrchr82r.h5"),
        compile=False)
    x88 = rng.normal(size=(16, 1, 1, 88)).astype(np.float32) * 3.0
    x96 = rng.normal(size=(16, 1, 1, 96)).astype(np.float32) * 3.0
    fixtures["x88"] = x88
    fixtures["y88"] = np.asarray(m88(x88))
    fixtures["x96"] = x96
    fixtures["y96"] = np.asarray(m96(x96))
    # spatial-map inputs (pose-map path of the unified model)
    xm88 = rng.normal(size=(2, 16, 16, 88)).astype(np.float32)
    xm96 = rng.normal(size=(2, 8, 8, 96)).astype(np.float32)
    fixtures["xmap88"] = xm88
    fixtures["ymap88"] = np.asarray(m88(xm88))
    fixtures["xmap96"] = xm96
    fixtures["ymap96"] = np.asarray(m96(xm96))
    np.savez_compressed(os.path.join(OUT, "heads.npz"), **fixtures)
    print("head goldens captured")


def capture_postprocess(model):
    """Exercise the reference post-processing (decode + NMS + pose lookup) on
    synthetic raw outputs via the real class methods (blazeFaceDetectorH5.py:284-357)."""
    import blazeFaceDetectorH5 as bfd

    det = bfd.blazeFaceDetector.__new__(bfd.blazeFaceDetector)
    det.scoreThreshold = 0.4
    det.iouThreshold = 0.3
    det.sigmoidScoreThreshold = np.log(det.scoreThreshold / (1 - det.scoreThreshold))
    det.inputWidth = det.inputHeight = 128
    det.channels = 3
    det.generateAnchors()

    rng = np.random.default_rng(3)
    fixtures = {}
    for case in range(3):
        cls = rng.normal(loc=-4.0, scale=1.0, size=(896,)).astype(np.float32)
        hot = rng.choice(896, size=24, replace=False)
        cls[hot] = rng.uniform(-0.3, 4.0, size=24).astype(np.float32)
        loc = rng.normal(scale=6.0, size=(896, 16)).astype(np.float32)
        loc[:, 2:4] = rng.uniform(8.0, 48.0, size=(896, 2)).astype(np.float32)
        pose_front = rng.normal(scale=30.0, size=(16, 16, 3)).astype(np.float32)
        pose_back = rng.normal(scale=30.0, size=(8, 8, 3)).astype(np.float32)

        scores, good = det.filterDetections(cls)
        boxes, keypoints = det.extractDetections(loc, good)
        res = det.filterWithNonMaxSupression(boxes, keypoints, scores, good,
                                             pose_front, pose_back)
        fixtures[f"cls{case}"] = cls
        fixtures[f"loc{case}"] = loc
        fixtures[f"pose_front{case}"] = pose_front
        fixtures[f"pose_back{case}"] = pose_back
        fixtures[f"boxes{case}"] = res.boxes.astype(np.float32)
        fixtures[f"keypoints{case}"] = res.keypoints.astype(np.float32)
        fixtures[f"scores{case}"] = res.scores.astype(np.float32)
        fixtures[f"poses{case}"] = res.poses.astype(np.float32)
        print(f"  case {case}: {len(res.scores)} detections survive")
    np.savez_compressed(os.path.join(OUT, "postprocess.npz"), **fixtures)
    print("postprocess goldens captured")


def capture_e2e(model):
    """Full reference pipeline (preprocess+forward+postprocess) on synthetic BGR images."""
    import blazeFaceDetectorH5 as bfd

    det = bfd.blazeFaceDetector.__new__(bfd.blazeFaceDetector)
    # low threshold so synthetic (face-free) images still produce detections,
    # exercising the whole decode+NMS+pose path end to end
    det.scoreThreshold = 0.05
    det.iouThreshold = 0.3
    det.sigmoidScoreThreshold = np.log(det.scoreThreshold / (1 - det.scoreThreshold))
    det.inputWidth = det.inputHeight = 128
    det.channels = 3
    det.fps = 0
    import time
    det.timeLastPrediction = time.time()
    det.frameCounter = 0
    det.interpreter = model
    det.generateAnchors()

    rng = np.random.default_rng(4)
    fixtures = {}
    for case, (h, w) in enumerate([(256, 256), (480, 480)]):
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.int64).astype(np.uint8)
        res = det.detectFaces(img)
        fixtures[f"img{case}"] = img
        fixtures[f"boxes{case}"] = np.asarray(res.boxes, np.float32)
        fixtures[f"keypoints{case}"] = np.asarray(res.keypoints, np.float32)
        fixtures[f"scores{case}"] = np.asarray(res.scores, np.float32)
        fixtures[f"poses{case}"] = np.asarray(res.poses, np.float32)
        print(f"  e2e case {case}: {len(res.scores)} detections")
    np.savez_compressed(os.path.join(OUT, "e2e.npz"), **fixtures)
    print("e2e goldens captured")


def _arch_signature(path: str) -> str:
    """Architecture signature of an H5 head: the sorted multiset of layer
    classes (h5py-only, no model build) — the stratification key."""
    import collections

    import h5py

    with h5py.File(path, "r") as f:
        cfg = json.loads(f.attrs["model_config"])
    counts = collections.Counter(
        l["class_name"] for l in cfg["config"]["layers"])
    return ",".join(f"{k}x{v}" for k, v in sorted(counts.items()))


def capture_zoo_sample(per_sig: int = 3):
    """Stratified numeric-parity sample: up to `per_sig` heads from EVERY
    distinct architecture signature across all three zoo directories, so
    rare layer combinations (Lambda/MHA variants, BatchNorm, Separable)
    are value-tested, not just load-tested (VERDICT r1, item 9)."""
    import collections
    import random

    rng = np.random.default_rng(7)
    random.seed(7)
    dirs = {
        "88": (os.path.join(REF, "Model-88/Trained-Models-88"), 88),
        "96nf": (os.path.join(
            REF, "Model-96/Trained-Models-96-ReshapedInput-NoFlatten"), 96),
        "96orig": (os.path.join(REF, "Model-96/Trained-Models-96"), 96),
    }
    groups: dict[tuple[str, str], list[str]] = collections.defaultdict(list)
    for key, (d, _) in dirs.items():
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".h5"):
                groups[(key, _arch_signature(os.path.join(d, fn)))].append(fn)

    fixtures, names = {}, []
    skipped = 0
    for (key, sig), files in sorted(groups.items()):
        d, c = dirs[key]
        took = 0
        for fn in random.sample(files, min(per_sig, len(files))):
            try:
                m = keras.models.load_model(os.path.join(d, fn),
                                            compile=False)
            except ValueError:
                # Lambda layers marshal Python bytecode; artifacts pickled
                # under another Python version can't execute in THIS
                # container's tf-keras, so no golden is obtainable (our own
                # graph compiler still loads them — the slow zoo sweep
                # covers that path)
                skipped += 1
                continue
            x = rng.normal(size=(3, 1, 1, c)).astype(np.float32) * 2
            tag = f"{key}_{fn.replace('.h5', '').replace('model_runid_', '')}"
            fixtures[f"x_{tag}"] = x
            fixtures[f"y_{tag}"] = np.asarray(m(x))
            fixtures[f"path_{tag}"] = np.array(os.path.join(d, fn))
            names.append(tag)
            took += 1
        print(f"  [{key}] {sig[:72]}: {took}/{len(files)}")
    if skipped:
        print(f"  ({skipped} heads skipped: Lambda bytecode not loadable "
              "by this container's tf-keras)")
    np.savez_compressed(os.path.join(OUT, "zoo_heads.npz"),
                        names=np.array(names), **fixtures)
    print("zoo sample captured:", len(names), "heads across",
          len(groups), "architecture signatures")


def capture_keras_train_trajectory():
    """Keras fit() loss/MAE trajectories with fixed weights, full batch,
    shuffle-free — the training-semantics parity oracle
    (tests/test_train_parity.py).  Each capture draws a fresh Glorot init but
    stores it in the fixture, so any regenerated npz is self-consistent."""
    rng = np.random.default_rng(5)
    n, cin, hidden = 64, 96, 8
    x = rng.normal(size=(n, 1, 1, cin)).astype(np.float32)
    y = rng.normal(size=(n, 1, 1, 3)).astype(np.float32) * 10

    inputs = keras.Input(shape=(None, None, cin))
    h = keras.layers.Conv2D(hidden, 1, activation="tanh",
                            kernel_regularizer=keras.regularizers.l2(1e-3),
                            bias_regularizer=keras.regularizers.l2(1e-3))(inputs)
    out = keras.layers.Conv2D(3, 1, activation=None,
                              kernel_regularizer=keras.regularizers.l2(1e-3),
                              bias_regularizer=keras.regularizers.l2(1e-3))(h)
    m = keras.Model(inputs, out)
    w0 = [np.asarray(w) for w in m.get_weights()]
    results = {}
    for opt_name, opt in (("sgd", keras.optimizers.SGD(0.01)),
                          ("adam", keras.optimizers.Adam(0.01))):
        m.set_weights([w.copy() for w in w0])
        m.compile(optimizer=opt, loss="mse", metrics=["mae"])
        hist = m.fit(x, y, batch_size=n, epochs=6, shuffle=False, verbose=0)
        results[f"loss_{opt_name}"] = np.asarray(hist.history["loss"], np.float64)
        results[f"mae_{opt_name}"] = np.asarray(hist.history["mae"], np.float64)
    np.savez_compressed(os.path.join(OUT, "keras_train_traj.npz"),
                        x=x, y=y, w0_k0=w0[0], w0_b0=w0[1],
                        w0_k1=w0[2], w0_b1=w0[3], **results)
    print("keras training trajectory captured")


def capture_e2e_production(model):
    """E2E golden at the production threshold (0.4) on a detection-rich image.

    Noise never crosses 0.4, so the image is synthesized by gradient ascent on
    the detector score (run separately with jax — see the snippet in
    tests/golden provenance / git history of e2e_production.npz); this
    function re-captures the reference outputs for an existing image."""
    import time

    import blazeFaceDetectorH5 as bfd

    prod = np.load(os.path.join(OUT, "e2e_production.npz"))
    img = prod["img"]
    det = bfd.blazeFaceDetector.__new__(bfd.blazeFaceDetector)
    det.scoreThreshold = 0.4
    det.iouThreshold = 0.3
    det.sigmoidScoreThreshold = np.log(0.4 / 0.6)
    det.inputWidth = det.inputHeight = 128
    det.channels = 3
    det.fps = 0
    det.timeLastPrediction = time.time()
    det.frameCounter = 0
    det.interpreter = model
    det.generateAnchors()
    res = det.detectFaces(img)
    # the synthesized img exists ONLY in this npz (the gradient-ascent run
    # is not re-runnable here) — never truncate it in place; write to a
    # temp file and atomically swap so an interrupted write cannot destroy
    # the input we just read
    path = os.path.join(OUT, "e2e_production.npz")
    tmp = os.path.join(OUT, "e2e_production.tmp.npz")  # savez appends .npz
                                                       # to suffix-less names
    np.savez_compressed(
        tmp,
        img=img, boxes=np.asarray(res.boxes, np.float32),
        keypoints=np.asarray(res.keypoints, np.float32),
        scores=np.asarray(res.scores, np.float32),
        poses=np.asarray(res.poses, np.float32))
    os.replace(tmp, path)
    print(f"e2e production golden captured ({len(res.scores)} detections)")


if __name__ == "__main__":
    capture_anchors()
    capture_resize()
    capture_heads()
    model = capture_unified_forward()
    capture_postprocess(model)
    capture_e2e(model)
    capture_e2e_production(model)
    capture_zoo_sample()
    capture_keras_train_trajectory()
    print("all goldens written to", os.path.abspath(OUT))
