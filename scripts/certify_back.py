"""Measure precision-island error through the BLAZEFACE_BACK topology.

The front-camera flagship's 'fast'/'turbo' modes are corpus-certified against
the reference implementation (scripts/certify_modes.py).  The back-camera
spec (256 input, one extra downsample stage — blazeFaceDetectorH5.py
INPUT_BACK; the reference ships no weights for it) derives its turbo island
generically (models/blazeface.py turbo_fast_blocks), and until round 3 the
island's error through the back topology was UNMEASURED (ADVICE r2 #5).

This script measures it two ways: (a) a seeded random-init back model is run
on-chip in 'highest' precision over synthetic 256x256 inputs, then each
accelerated mode's raw pipeline outputs are compared against it — score error
in probability units, localisation error in input pixels, pose error in
degrees, p50/p99/max over every anchor/cell x image — quantifying how island
rounding propagates through the back *topology* (depth/shapes); and (b) the
same sweep on the SHIPPED distilled back weights (unified-back-distilled,
scripts/distill_back.py) over parity-corpus content, giving the islands a
trained net's dynamic range.  Neither is a reference-parity certificate (the
reference ships no back weights to be compared against — the distilled model's
own held-out agreement lives in its metadata); they bound the accelerated
modes' error relative to the model's own 'highest'.  NMS'd-detection matching
(the front methodology) is deliberately not used here: random-init boxes have
near-zero extents, so IoU matching degenerates.

Run on the real chip:  python scripts/certify_back.py   (~8 tunnel compiles)
Writes docs/certification_back.json.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "docs", "certification_back.json")
N_IMAGES = 64
MODES = ("fast", "turbo", "max")


def dist(errs: np.ndarray) -> dict:
    a = np.asarray(errs, np.float64).ravel()
    return {"n": int(a.size),
            "p50": float(np.percentile(a, 50)),
            "p99": float(np.percentile(a, 99)),
            "max": float(a.max())}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from headpose_tpu.models import BLAZEFACE_BACK
    from headpose_tpu.models.blazeface import turbo_fast_blocks
    from headpose_tpu.models.heads import MLPHead
    from headpose_tpu.models.unified import join_models
    from headpose_tpu.ops.image import preprocess

    def sweep(model, uparams, spec, imgs, label, channel_order):
        def run(mode):
            # mirror FaceDetector's forward configuration per mode
            # (runtime/detector.py): dense composition + 'high' ambient
            # matmul precision + the mode's bf16 block island
            fast = mode in ("fast", "turbo", "max")
            kwargs = {"dense": True} if fast else {}
            if mode == "turbo":
                kwargs["fast_blocks"] = turbo_fast_blocks(spec)
            elif mode == "max":
                kwargs["fast_blocks"] = tuple(range(len(spec.block_channels)))

            @jax.jit
            def fwd(p, x):
                with jax.default_matmul_precision("high" if fast else mode):
                    return model.apply(p, preprocess(x, spec.input_size,
                                                     channel_order),
                                       **kwargs)

            out = fwd(uparams, imgs)
            jax.block_until_ready(out["scores"])
            return {k: np.asarray(v, np.float32) for k, v in out.items()}

        ref = run("highest")
        ref_prob = 0.5 * (1.0 + np.tanh(0.5 * ref["scores"]))  # stable sigmoid
        report = {}
        for mode in MODES:
            out = run(mode)
            prob = 0.5 * (1.0 + np.tanh(0.5 * out["scores"]))
            report[mode] = {
                "score_prob": dist(np.abs(prob - ref_prob)),
                "loc_px": dist(np.abs(out["loc"] - ref["loc"])),
                "pose_front_deg": dist(np.abs(out["pose_front"]
                                              - ref["pose_front"])),
                "pose_back_deg": dist(np.abs(out["pose_back"]
                                             - ref["pose_back"])),
            }
            r = report[mode]
            print(f"{label}/{mode:>6}: score p99 {r['score_prob']['p99']:.3g} "
                  f"loc_px p99 {r['loc_px']['p99']:.3g} "
                  f"pose deg p99 {r['pose_front_deg']['p99']:.3g}/"
                  f"{r['pose_back_deg']['p99']:.3g} "
                  f"max {r['pose_front_deg']['max']:.3g}/"
                  f"{r['pose_back_deg']['max']:.3g}", flush=True)
        return report

    spec = BLAZEFACE_BACK
    params = spec.init(jax.random.PRNGKey(0))
    h88 = MLPHead(88, ((16, "softsign"), (3, "linear")))
    h96 = MLPHead(96, ((16, "tanh"), (3, "linear")))
    model, uparams = join_models(spec, params,
                                 h88, h88.init(jax.random.PRNGKey(2)),
                                 h96, h96.init(jax.random.PRNGKey(3)))
    imgs = np.random.default_rng(7).integers(
        0, 256, size=(N_IMAGES, 256, 256, 3)).astype(np.uint8)
    # channel order is irrelevant for random weights on random inputs;
    # "rgb" kept for continuity with the r2 measurement
    report = sweep(model, uparams, spec, imgs, "random-init", "rgb")

    out_doc = {
        "spec": "BLAZEFACE_BACK (random init, PRNGKey(0)/2/3 — structural "
                "propagation measure; see module docstring)",
        "reference_mode": "highest (same chip)",
        "backend": jax.devices()[0].platform,
        "images": N_IMAGES,
        "turbo_island": list(map(int, turbo_fast_blocks(spec))),
        "modes": report,
    }

    # the shipped distilled back weights (scripts/distill_back.py) carry a
    # trained net's dynamic range — measure the islands on them too, over
    # the parity-corpus content (upscaled through the production preprocess
    # exactly as serving does)
    trained_dir = os.path.join(REPO, "headpose_tpu", "pretrained_models",
                               "unified-back-distilled")
    corpus_path = os.path.join(REPO, "tests", "golden", "parity_corpus.npz")
    if os.path.isdir(trained_dir) and os.path.exists(corpus_path):
        from headpose_tpu.tools.export import load_model

        tmodel, tparams = load_model(trained_dir)
        corpus = np.load(corpus_path)["imgs"][:N_IMAGES]
        # "bgr": the order the model was distilled and is served with
        # (FaceDetector default, scripts/distill_back.py)
        out_doc["trained_modes"] = sweep(tmodel, tparams, tmodel.backbone,
                                         corpus, "trained", "bgr")
        out_doc["trained_spec"] = ("unified-back-distilled (shipped), "
                                   "parity-corpus images")

    with open(OUT, "w") as f:
        json.dump(out_doc, f, indent=2)
    print(f"saved {OUT}", flush=True)


if __name__ == "__main__":
    main()
