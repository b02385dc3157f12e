"""Build the precision-mode parity-validation corpus (tests/golden/parity_corpus.npz).

The round-2 'turbo' parity claim (0.07 deg) was a max over THREE golden images;
this script widens it to a ~100-image corpus of detection-rich inputs so every
serving mode can be certified on a *distribution* (p50/p99/max pose error +
detection-set agreement), per VERDICT round 2 item 1.

Images are synthesized by batched gradient ascent on the native flagship
detector's anchor logits (the same technique that produced
tests/golden/e2e_production.npz): starting from flat gray, each image is pushed
until a per-image random set of target anchors (1-5 faces, front/back grids,
spread across quadrants) crosses a per-target random score cap in
[0.50, 0.998] — noise never crosses the production threshold 0.4
(blazeFaceDetectorH5.py:82), so ascent is the only in-container way to get
detection-rich images at production settings.  Reference outputs are then
captured by driving the reference pipeline itself (detectFaces,
blazeFaceDetectorH5.py:109-126) with tf-keras at scoreThreshold=0.4.

Run:  python scripts/make_parity_corpus.py            (TPU ascent ~2 min, then
                                                       tf-keras capture ~10 s)
"""
from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference"
OUT = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")

N_IMAGES = 112          # keep >= 100 after requiring >=1 reference detection
SIZE = 128              # the ask: 128x128 inputs (VERDICT r2 next-round #1)
MAX_TARGETS = 5
ASCENT_STEPS = 600
SEED = 1234


def pick_targets(rng: np.random.Generator):
    """Per-image target anchors: k faces in distinct image cells, mixing the
    front (16x16 grid, 2/cell, anchors 0-511) and back (8x8, 6/cell, 512-895)
    SSD grids, with per-target logit caps giving varied final scores."""
    k = int(rng.integers(1, MAX_TARGETS + 1))
    # sample distinct 8x8 macro-cells so faces land apart and survive NMS
    cells = rng.choice(64, size=k, replace=False)
    anchors, caps = [], []
    for c in cells:
        r8, c8 = int(c) // 8, int(c) % 8
        if rng.random() < 0.5:
            # front grid: one of the 4 16x16 cells inside this macro-cell
            r16, c16 = 2 * r8 + int(rng.integers(2)), 2 * c8 + int(rng.integers(2))
            anchors.append((r16 * 16 + c16) * 2 + int(rng.integers(2)))
        else:
            anchors.append(512 + (r8 * 8 + c8) * 6 + int(rng.integers(6)))
        # score caps: probabilities ~[0.50, 0.998] -> logits [0, ~6.2]
        caps.append(float(rng.uniform(0.0, 6.2)))
    pad = MAX_TARGETS - k
    return (np.array(anchors + [0] * pad, np.int32),
            np.array(caps + [0.0] * pad, np.float32),
            np.array([1.0] * k + [0.0] * pad, np.float32))


def synthesize() -> np.ndarray:
    import jax
    import jax.numpy as jnp
    import optax

    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.pretrained import load_flagship

    model, params = load_flagship()
    rng = np.random.default_rng(SEED)
    tgt_idx = np.zeros((N_IMAGES, MAX_TARGETS), np.int32)
    tgt_cap = np.zeros((N_IMAGES, MAX_TARGETS), np.float32)
    tgt_w = np.zeros((N_IMAGES, MAX_TARGETS), np.float32)
    for i in range(N_IMAGES):
        tgt_idx[i], tgt_cap[i], tgt_w[i] = pick_targets(rng)

    idx, cap, w = jnp.asarray(tgt_idx), jnp.asarray(tgt_cap), jnp.asarray(tgt_w)
    opt = optax.adam(0.08)

    def loss_fn(z):
        imgs = jax.nn.sigmoid(z) * 255.0
        with jax.default_matmul_precision("highest"):
            x = preprocess(imgs, SIZE, "bgr")
            logits = model.apply(params, x)["scores"]        # (N, 896)
        hit = jnp.take_along_axis(logits, idx, axis=1)       # (N, MAX_TARGETS)
        # maximize each target logit up to its cap (+0.8 rounding margin)
        return -jnp.sum(w * jnp.minimum(hit, cap + 0.8))

    @jax.jit
    def run(z):
        state = opt.init(z)

        def step(_, carry):
            z, state = carry
            g = jax.grad(loss_fn)(z)
            updates, state = opt.update(g, state)
            return optax.apply_updates(z, updates), state

        z, _ = jax.lax.fori_loop(0, ASCENT_STEPS, step, (z, state))
        return jax.nn.sigmoid(z) * 255.0

    z0 = jnp.zeros((N_IMAGES, SIZE, SIZE, 3), jnp.float32)
    imgs = np.asarray(run(z0))
    return np.clip(np.rint(imgs), 0, 255).astype(np.uint8)


def capture_reference(imgs: np.ndarray):
    """Drive the REFERENCE pipeline (tf-keras) at production settings."""
    import time

    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    sys.path.insert(0, os.path.join(REF, "BlazePoser"))
    import tf_keras as keras
    import blazeFaceDetectorH5 as bfd

    model = keras.models.load_model(
        os.path.join(REF, "BlazePoser/UnifiedModels/"
                     "reg1-stoqa9pt-reg2-hrchr82r-selected.h5"), compile=False)
    det = bfd.blazeFaceDetector.__new__(bfd.blazeFaceDetector)
    det.scoreThreshold = 0.4
    det.iouThreshold = 0.3
    det.sigmoidScoreThreshold = np.log(0.4 / 0.6)
    det.inputWidth = det.inputHeight = SIZE
    det.channels = 3
    det.fps = 0
    det.timeLastPrediction = time.time()
    det.frameCounter = 0
    det.interpreter = model
    det.generateAnchors()

    results = [det.detectFaces(img) for img in imgs]
    counts = np.array([len(r.scores) for r in results], np.int32)
    return results, counts


def main():
    print(f"synthesizing {N_IMAGES} images ({ASCENT_STEPS} ascent steps)...")
    imgs = synthesize()
    print("capturing reference outputs (tf-keras, threshold 0.4)...")
    results, counts = capture_reference(imgs)

    keep = counts > 0
    imgs, counts = imgs[keep], counts[keep]
    results = [r for r, k in zip(results, keep) if k]
    n, maxd = len(imgs), int(counts.max())
    print(f"kept {n}/{N_IMAGES} images with >=1 detection "
          f"(counts: min {counts.min()}, median {int(np.median(counts))}, "
          f"max {maxd}; total {counts.sum()} detections)")
    assert n >= 100, f"only {n} detection-rich images; raise N_IMAGES"

    boxes = np.zeros((n, maxd, 4), np.float32)
    keypoints = np.zeros((n, maxd, 6, 2), np.float32)
    scores = np.zeros((n, maxd), np.float32)
    poses = np.zeros((n, maxd, 3), np.float32)
    for i, r in enumerate(results):
        c = counts[i]
        boxes[i, :c] = np.asarray(r.boxes, np.float32)
        keypoints[i, :c] = np.asarray(r.keypoints, np.float32)
        scores[i, :c] = np.asarray(r.scores, np.float32)
        poses[i, :c] = np.asarray(r.poses, np.float32)

    np.savez_compressed(OUT, imgs=imgs, counts=counts, boxes=boxes,
                        keypoints=keypoints, scores=scores, poses=poses)
    sha = hashlib.sha256(open(OUT, "rb").read()).hexdigest()
    mb = os.path.getsize(OUT) / 1e6
    print(f"wrote {OUT} ({mb:.1f} MB, sha256 {sha[:16]}...)")


if __name__ == "__main__":
    main()
