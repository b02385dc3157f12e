"""Bring up the back-camera detector (BLAZEFACE_BACK) by distilling the
shipped front flagship into it — the first trained weights this topology has
had anywhere (the reference reserves INPUT_BACK=256 but ships neither weights
nor a runtime path, blazeFaceDetectorH5.py:8-11).

Teacher: the imported production front detector (128 input).  Student: the
256-input back topology, trained with train/detector.py — the
anchor tables are identical in normalized coordinates and loc targets scale
by 2x (alignment facts tested in tests/test_detector_train.py), and matching
the feat88/feat96 taps makes the student a drop-in backbone for the shipped
pose heads, which are grafted unchanged into the saved artifact.

Training data is synthetic (this container has no face images): detection-
rich images synthesized by gradient ascent on the teacher's anchor logits —
the parity-corpus technique (make_parity_corpus.py) at a DIFFERENT seed, so
the shipped 112-image corpus stays a held-out eval set — plus rolled copies
(translation augmentation; the teacher recomputes targets on the rolled
frames) and noise/flat negatives.  HONEST LABEL: this is a topology bring-up
distilled on synthetic imagery, demonstrating the detector-training
capability end to end; it mimics the front detector (including on held-out
synthetic data, measured below), and is NOT a real-world back-camera face
detector — retrain/fine-tune when real 256-input data exists.

Recipe: teacher warm start → prefix alignment (6k steps, --prefix-steps) →
whole-network polish (20k steps default, --steps / --lr / --batch; the
shipped artifact used --steps 60000 --lr 4e-4, ~22 min total on this chip
including ascent + eval).  --scratch runs the measured-worse single-stage
baseline.  Run on the real chip:
    python scripts/distill_back.py [--steps N] [--lr X] [--scratch]
Writes headpose_tpu/pretrained_models/unified-back-distilled/ and
docs/distill_back_result.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CORPUS = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")
OUT_MODEL = os.path.join(REPO, "headpose_tpu", "pretrained_models",
                         "unified-back-distilled")
OUT_JSON = os.path.join(REPO, "docs", "distill_back_result.json")

SEED = 777              # ≠ the corpus's 1234: training never sees the eval set
N_ASCENT = 1024
ASCENT_STEPS = 400
ASCENT_CHUNK = 256
N_NOISE = 256
N_FLAT = 128


def synthesize_ascent(n: int, seed: int) -> np.ndarray:
    """Detection-rich 128x128 images by gradient ascent on the teacher's
    anchor logits (same technique/hyperparameters as the parity corpus,
    fresh seed), in chunks to bound the fwd+bwd footprint."""
    import jax
    import jax.numpy as jnp
    import optax

    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.pretrained import load_flagship
    from make_parity_corpus import MAX_TARGETS, SIZE, pick_targets

    model, params = load_flagship()
    rng = np.random.default_rng(seed)
    tgt_idx = np.zeros((n, MAX_TARGETS), np.int32)
    tgt_cap = np.zeros((n, MAX_TARGETS), np.float32)
    tgt_w = np.zeros((n, MAX_TARGETS), np.float32)
    for i in range(n):
        tgt_idx[i], tgt_cap[i], tgt_w[i] = pick_targets(rng)

    opt = optax.adam(0.08)

    def loss_fn(z, idx, cap, w):
        imgs = jax.nn.sigmoid(z) * 255.0
        with jax.default_matmul_precision("highest"):
            x = preprocess(imgs, SIZE, "bgr")
            logits = model.apply(params, x)["scores"]
        hit = jnp.take_along_axis(logits, idx, axis=1)
        return -jnp.sum(w * jnp.minimum(hit, cap + 0.8))

    @jax.jit
    def run(idx, cap, w):
        z0 = jnp.zeros((idx.shape[0], SIZE, SIZE, 3), jnp.float32)
        state = opt.init(z0)

        def step(_, carry):
            z, state = carry
            g = jax.grad(loss_fn)(z, idx, cap, w)
            updates, state = opt.update(g, state)
            return optax.apply_updates(z, updates), state

        z, _ = jax.lax.fori_loop(0, ASCENT_STEPS, step, (z0, state))
        return jax.nn.sigmoid(z) * 255.0

    out = []
    for i in range(0, n, ASCENT_CHUNK):
        sl = slice(i, i + ASCENT_CHUNK)
        imgs = np.asarray(run(jnp.asarray(tgt_idx[sl]),
                              jnp.asarray(tgt_cap[sl]),
                              jnp.asarray(tgt_w[sl])))
        out.append(np.clip(np.rint(imgs), 0, 255).astype(np.uint8))
        print(f"  ascent {min(i + ASCENT_CHUNK, n)}/{n}", flush=True)
    return np.concatenate(out, axis=0)


def build_training_set(seed: int = SEED) -> np.ndarray:
    rng = np.random.default_rng(seed + 1)
    print(f"synthesizing {N_ASCENT} detection-rich images "
          f"({ASCENT_STEPS} ascent steps, chunks of {ASCENT_CHUNK})...",
          flush=True)
    ascent = synthesize_ascent(N_ASCENT, seed)
    # translation augmentation: rolled copies — the teacher recomputes
    # targets on the rolled frame, so faces appear at fresh anchor cells
    dy = rng.integers(-40, 41, size=N_ASCENT)
    dx = rng.integers(-40, 41, size=N_ASCENT)
    rolled = np.stack([np.roll(np.roll(a, int(y), 0), int(x), 1)
                       for a, y, x in zip(ascent, dy, dx)])
    noise = rng.integers(0, 256, size=(N_NOISE, 128, 128, 3)).astype(np.uint8)
    flats = np.broadcast_to(
        rng.integers(0, 256, size=(N_FLAT, 1, 1, 3)),
        (N_FLAT, 128, 128, 3)).astype(np.uint8)
    imgs = np.concatenate([ascent, rolled, noise, flats], axis=0)
    print(f"training set: {imgs.shape[0]} images "
          f"({N_ASCENT} ascent + {N_ASCENT} rolled + {N_NOISE} noise + "
          f"{N_FLAT} flat)", flush=True)
    return imgs


def dist(errs) -> dict:
    a = np.asarray(errs, np.float64).ravel()
    if a.size == 0:
        return {"n": 0}
    return {"n": int(a.size), "p50": float(np.percentile(a, 50)),
            "p99": float(np.percentile(a, 99)), "max": float(a.max())}


def eval_raw_agreement(student_params, corpus_imgs) -> dict:
    """Held-out raw-output agreement: the distilled back model vs its
    teacher on the parity-corpus images (never seen in training)."""
    import jax
    import jax.numpy as jnp

    from headpose_tpu.models.blazeface import BLAZEFACE_BACK
    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.pretrained import load_flagship

    model, params = load_flagship()
    front_spec = model.backbone

    @jax.jit
    def fwd_front(spec_params, imgs):
        with jax.default_matmul_precision("highest"):
            return front_spec.apply(spec_params, preprocess(imgs, 128, "bgr"))

    @jax.jit
    def fwd_back(spec_params, imgs):
        with jax.default_matmul_precision("highest"):
            return BLAZEFACE_BACK.apply(spec_params,
                                        preprocess(imgs, 256, "bgr"))

    imgs = jnp.asarray(corpus_imgs)
    t = jax.tree.map(np.asarray, fwd_front(params["backbone"], imgs))
    s = jax.tree.map(np.asarray, fwd_back(student_params, imgs))
    t_prob = 0.5 * (1.0 + np.tanh(0.5 * t["scores"]))   # stable sigmoid
    s_prob = 0.5 * (1.0 + np.tanh(0.5 * s["scores"]))
    w = t_prob[..., None]
    loc_err_px128 = np.abs(s["loc"] / 2.0 - t["loc"])
    return {
        "score_prob": dist(np.abs(s_prob - t_prob)),
        # loc error in 128-scale pixels, weighted to where the teacher
        # actually sees faces (background offsets are meaningless)
        "loc_px128_weighted_mean": float(np.sum(w * loc_err_px128)
                                         / (np.sum(w) * 16)),
        "loc_px128_at_detections": dist(
            loc_err_px128[t_prob > 0.4].ravel()),
        "feat88_rel_rmse": float(np.sqrt(np.mean((s["feat88"] - t["feat88"]) ** 2)
                                         / np.mean(t["feat88"] ** 2))),
        "feat96_rel_rmse": float(np.sqrt(np.mean((s["feat96"] - t["feat96"]) ** 2)
                                         / np.mean(t["feat96"] ** 2))),
    }


def eval_e2e(corpus: dict) -> dict:
    """End-to-end detection eval of the saved artifact on the held-out
    corpus vs the REFERENCE goldens (certify_modes methodology)."""
    from certify_modes import certify

    from headpose_tpu.runtime.detector import FaceDetector

    def factory(mode):
        return FaceDetector.from_native(OUT_MODEL, score_threshold=0.4,
                                        iou_threshold=0.3, precision=mode)

    return certify(factory, corpus, modes=("highest",))


def main() -> None:
    import jax

    from headpose_tpu.models.blazeface import BLAZEFACE_BACK
    from headpose_tpu.models.unified import join_models
    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.tools.export import save_model
    from headpose_tpu.train.detector import (DetectorDistillConfig,
                                             distill_detector)

    # --smoke: tiny end-to-end pipeline validation (CPU-friendly); does NOT
    # overwrite the shipped artifact or docs JSON
    smoke = "--smoke" in sys.argv[1:]
    if smoke:
        global N_ASCENT, ASCENT_STEPS, ASCENT_CHUNK, N_NOISE, N_FLAT
        global OUT_MODEL, OUT_JSON
        N_ASCENT, ASCENT_STEPS, ASCENT_CHUNK, N_NOISE, N_FLAT = 8, 5, 8, 4, 4
        OUT_MODEL = "/tmp/unified-back-distilled-smoke"
        OUT_JSON = "/tmp/distill_back_smoke.json"
        jax.config.update("jax_platforms", "cpu")

    def flag(name, default, cast):
        argv = sys.argv[1:]
        if name not in argv:
            return default
        i = argv.index(name)
        if i + 1 >= len(argv) or argv[i + 1].startswith("--"):
            raise SystemExit(f"{name} requires a value")
        try:
            return cast(argv[i + 1])
        except ValueError as e:
            raise SystemExit(f"{name}: {e}")

    # parse ALL flags before the expensive synthesis so a typo fails in
    # milliseconds, not after the ascent phase
    scratch = "--scratch" in sys.argv[1:]
    steps = flag("--steps", 20000, int)
    prefix_steps = flag("--prefix-steps", 6000, int)
    batch = flag("--batch", 64, int)
    lr = flag("--lr", 1e-3 if scratch else 3e-4, float)
    feat_eps = flag("--feat-eps", 0.0, float)

    t0 = time.time()
    imgs = build_training_set()

    model, params = load_flagship()

    # Three-stage recipe (each stage measured necessary, docs/
    # distill_back_result.json history):
    #   1. warm start — the back topology is the front plus one extra
    #      leading block, so the teacher's own weights seed the shared
    #      suffix (train/detector.warmstart_params);
    #   2. prefix alignment — train ONLY stem+block0 to reproduce the
    #      teacher's stem map (the one genuinely new function: absorbing
    #      the 2x input resolution); the teacher-weight suffix then
    #      matches by construction;
    #   3. whole-network distillation polish at low lr.
    # From-scratch single-stage runs plateaued at held-out feature rmse
    # ~0.54 (8k and 50k steps agree — capacity/optimization, not steps).
    def on_sync(step, m):
        extra = (f" (feat {m['feat']:.4f} score {m['score']:.5f} "
                 f"loc {m['loc']:.4f})" if "feat" in m else "")
        print(f"  step {step}: loss {m['loss']:.4f}{extra} "
              f"[{time.time() - t0:.0f}s]", flush=True)

    init = None
    if not scratch:
        from headpose_tpu.train.detector import (distill_prefix,
                                                 warmstart_params)
        init = warmstart_params(BLAZEFACE_BACK, model.backbone,
                                params["backbone"])
        pre_cfg = (DetectorDistillConfig(steps=20, batch_size=4,
                                         steps_per_sync=10, warmup_steps=2,
                                         seed=SEED) if smoke else
                   DetectorDistillConfig(steps=prefix_steps,
                                         batch_size=32, learning_rate=2e-3,
                                         warmup_steps=200,
                                         steps_per_sync=1000, seed=SEED))
        print(f"phase A: aligning stem+block0 on the teacher stem map "
              f"({pre_cfg.steps} steps)...", flush=True)
        init, _ = distill_prefix(BLAZEFACE_BACK, 0, model.backbone, -1,
                                 params["backbone"], imgs, pre_cfg,
                                 init_params=init, on_sync=on_sync)

    cfg = (DetectorDistillConfig(steps=20, batch_size=4, steps_per_sync=10,
                                 warmup_steps=2, seed=SEED,
                                 feat_cell_eps=feat_eps) if smoke else
           DetectorDistillConfig(steps=steps, batch_size=batch,
                                 learning_rate=lr, warmup_steps=1000,
                                 steps_per_sync=2000, seed=SEED,
                                 feat_cell_eps=feat_eps))
    print(f"distilling BLAZEFACE_BACK ({cfg.steps} steps, batch "
          f"{cfg.batch_size}, lr {cfg.learning_rate}, "
          f"{'from scratch' if scratch else 'warm-started'}) on "
          f"{jax.devices()[0].platform}...", flush=True)

    student_params, hist = distill_detector(
        BLAZEFACE_BACK, model.backbone, params["backbone"], imgs, cfg,
        init_params=init, on_sync=on_sync)

    print("evaluating on the held-out parity corpus...", flush=True)
    corpus = dict(np.load(CORPUS))
    raw = eval_raw_agreement(student_params, corpus["imgs"])
    print(f"  raw vs teacher: score prob p99 {raw['score_prob']['p99']:.4f} "
          f"max {raw['score_prob']['max']:.4f}; loc@det p99 "
          f"{raw['loc_px128_at_detections'].get('p99', 0):.3f} px(128); "
          f"feat rel rmse {raw['feat88_rel_rmse']:.4f}/"
          f"{raw['feat96_rel_rmse']:.4f}", flush=True)

    # graft the shipped pose heads unchanged (feat taps are distilled to
    # match) and save the unified artifact
    unified, uparams = join_models(BLAZEFACE_BACK, student_params,
                                   model.head88, params["head88"],
                                   model.head96, params["head96"])
    metadata = {
        "provenance": "distilled from the imported front flagship "
                      "(unified-stoqa9pt-hrchr82r) by scripts/distill_back.py "
                      "— synthetic training imagery (gradient-ascent + noise, "
                      f"seed {SEED}; the parity corpus is held out), "
                      "train/detector.py recipe in this metadata.  NOT a "
                      "real-world back-camera detector: a topology bring-up "
                      "demonstrating detector training; the reference ships "
                      "no back weights at all (INPUT_BACK reserved, "
                      "blazeFaceDetectorH5.py:8-11).",
        "teacher": "unified-stoqa9pt-hrchr82r",
        "pose_heads": "teacher's stoqa9pt/hrchr82r, grafted unchanged",
        "recipe": ("from-scratch single-stage" if scratch else
                   "teacher warm start (warmstart_params) -> prefix "
                   "alignment (distill_prefix: stem+block0 vs teacher stem "
                   "map) -> whole-network distillation polish"),
        "train_config": {k: getattr(cfg, k) for k in
                         ("steps", "batch_size", "learning_rate",
                          "warmup_steps", "seed", "precision",
                          "feat_cell_eps")},
        "train_images": int(imgs.shape[0]),
        "final_loss": float(np.mean(hist["loss"][-50:])),
        "heldout_raw_agreement": raw,
    }
    save_model(OUT_MODEL, unified, uparams, metadata=metadata)
    print(f"saved {OUT_MODEL}", flush=True)

    e2e = eval_e2e(corpus)
    metadata["heldout_e2e_vs_reference"] = e2e["highest"]
    save_model(OUT_MODEL, unified, uparams, metadata=metadata)

    doc = {"backend": jax.devices()[0].platform,
           "wall_s": round(time.time() - t0, 1),
           "loss_curve_every_500": [float(np.mean(hist["loss"][max(0, i - 10):i + 1]))
                                    for i in range(499, cfg.steps, 500)],
           **metadata}
    with open(OUT_JSON, "w") as f:
        json.dump(doc, f, indent=2)
    print(f"saved {OUT_JSON}", flush=True)


if __name__ == "__main__":
    main()
