"""Calibrate the flagship unified model for the all-blocks bf16 island and
evaluate golden-image pose error in the REAL deployed config (DEFAULT
precision on the MXU, no simulation).

Run on the TPU:  PYTHONPATH=/root/repo python scripts/calibrate_flagship.py
Writes the calibrated artifact to headpose_tpu/pretrained_models/... only
when --save is passed.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from headpose_tpu.pretrained import load_flagship
from headpose_tpu.models.anchors import FRONT_CONFIG, generate_anchors
from headpose_tpu.ops.detection import postprocess
from headpose_tpu.ops.image import preprocess
from headpose_tpu.train.calibrate import ALL_BLOCKS, calibrate_fast_params


def _golden_ref(model0, params0):
    """Reference outputs: the ORIGINAL flagship through the exact-f32
    pipeline on the golden images (the reference parity contract).
    Computed once and passed to golden_pose_err."""
    anchors = jnp.asarray(generate_anchors(FRONT_CONFIG), jnp.float32)
    g = np.load("/root/repo/tests/golden/e2e.npz")
    gp = np.load("/root/repo/tests/golden/e2e_production.npz")
    imgs = jax.device_put(np.stack([g["img0"], gp["img"]]))

    def post(out):
        return jax.vmap(lambda s, l, pf, pb: postprocess(
            s, l, pf, pb, anchors, score_threshold=0.4, iou_threshold=0.3,
            input_size=128, max_faces=100))(
            out["scores"], out["loc"], out["pose_front"], out["pose_back"])

    @jax.jit
    def exact_pipe(p, images):
        with jax.default_matmul_precision("highest"):
            x = preprocess(images, 128, "bgr")
            return post(model0.apply(p, x))

    ref = jax.tree_util.tree_map(np.asarray, exact_pipe(params0, imgs))
    return ref, imgs, post


def golden_pose_err(model, params, fast_blocks, ref, imgs, post,
                    simulate=False):
    """Max pose/box error (deg / norm units) of the bf16-island pipeline vs
    the precomputed reference outputs; also whether detection sets match."""
    @jax.jit
    def fast_pipe(p, images):
        with jax.default_matmul_precision("high"):
            x = preprocess(images, 128, "bgr")
            return post(model.apply(p, x, dense=True, fast_blocks=fast_blocks,
                                    simulate_fast=simulate))

    out = jax.tree_util.tree_map(np.asarray, fast_pipe(params, imgs))
    same = bool((out["valid"] == ref["valid"]).all())
    m = ref["valid"].astype(bool) & out["valid"].astype(bool)
    if not m.any():
        return same, float("nan"), float("nan")
    perr = float(np.abs(out["poses"][m] - ref["poses"][m]).max())
    boxerr = float(np.abs(out["boxes"][m] - ref["boxes"][m]).max())
    return same, perr, boxerr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save", default=None,
                    help="directory to save the calibrated unified model")
    args = ap.parse_args()

    print("devices:", jax.devices())
    model, params = load_flagship()
    ref, imgs, post = _golden_ref(model, params)

    same, perr, boxerr = golden_pose_err(model, params, ALL_BLOCKS,
                                         ref, imgs, post)
    print(f"UNCALIBRATED  same_valid={same} pose_err={perr:.5f} box_err={boxerr:.5f}")

    newp, hist = calibrate_fast_params(
        model, params, steps=args.steps, batch=args.batch,
        learning_rate=args.lr, seed=args.seed)
    L = hist["loss"]
    for i in list(range(0, min(10, len(L)))) + list(
            range(10, len(L), max(len(L) // 20, 1))):
        print(f"step {i:5d}  loss {L[i]:.6f}  pf {hist['pose_front'][i]:.6f} "
              f"pb {hist['pose_back'][i]:.6f} sc {hist['scores'][i]:.6f} "
              f"loc {hist['loc'][i]:.6f}")
    print(f"final loss {L[-1]:.6f}")

    same, perr, boxerr = golden_pose_err(model, newp, ALL_BLOCKS,
                                         ref, imgs, post)
    print(f"CALIBRATED    same_valid={same} pose_err={perr:.5f} box_err={boxerr:.5f}")

    if args.save:
        from headpose_tpu.tools.export import save_model
        save_model(args.save, model, newp)
        print("saved to", args.save)


if __name__ == "__main__":
    main()
