"""Tests for train/calibrate.py — bf16-island self-distillation.

The MXU-faithfulness of simulate_fast (bit-exactness to real DEFAULT-
precision islands) was verified on the chip (docs/BENCH.md); these tests
cover the CPU-checkable properties: the rounding model is applied, frozen
heads stay frozen, and a short calibration run reduces the distillation
loss on a tiny model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headpose_tpu.models.blazeface import BlazeFace
from headpose_tpu.models.heads import MLPHead
from headpose_tpu.models.unified import UnifiedPoseModel
from headpose_tpu.train.calibrate import (
    calibrate_fast_params, synthesize_images)


def tiny_unified():
    spec = BlazeFace(input_size=32, stem_features=8,
                     block_channels=(8, 12, 16), downsample_blocks=(1,),
                     tap88_block=0)
    model = UnifiedPoseModel(backbone=spec,
                             head88=MLPHead(8, ((4, "tanh"), (3, "linear"))),
                             head96=MLPHead(16, ((3, "linear"),)))
    key = jax.random.PRNGKey(0)
    params = {"backbone": spec.init(key),
              "head88": model.head88.init(jax.random.fold_in(key, 1)),
              "head96": model.head96.init(jax.random.fold_in(key, 2))}
    return model, params


def test_synthesize_images_range_and_shape():
    imgs = synthesize_images(jax.random.PRNGKey(0), 6, 32)
    assert imgs.shape == (6, 32, 32, 3)
    assert float(imgs.min()) >= -1.0 and float(imgs.max()) <= 1.0
    # images differ across the batch and are not constant fields
    flat = np.asarray(imgs).reshape(6, -1)
    assert np.std(flat, axis=1).min() > 0.01
    assert np.abs(flat[0] - flat[1]).max() > 0.05


@pytest.mark.heavy  # 25s; bf16 self-calibration is a niche lane
def test_simulate_fast_applies_rounding():
    model, params = tiny_unified()
    x = synthesize_images(jax.random.PRNGKey(1), 2, 32)
    fb = (0, 1, 2)
    exact = model.apply(params, x, dense=True, fast_blocks=fb)
    sim = model.apply(params, x, dense=True, fast_blocks=fb,
                      simulate_fast=True)
    # On CPU DEFAULT precision is f32, so the only difference is the
    # explicit bf16 rounding — it must actually perturb the outputs...
    d = float(jnp.abs(sim["pose_back"] - exact["pose_back"]).max())
    assert d > 1e-6
    # ...but only at rounding scale, not wholesale.
    scale = float(jnp.abs(exact["pose_back"]).max())
    assert d < 0.05 * max(scale, 1.0)
    # no islands -> no rounding applied anywhere
    off = model.apply(params, x, dense=True, simulate_fast=True)
    base = model.apply(params, x, dense=True)
    assert float(jnp.abs(off["pose_back"] - base["pose_back"]).max()) == 0.0


def test_simulate_fast_operand_selective_modes():
    """'weights' / 'acts' round only that operand — the decomposition probes
    behind the turbo island choice (docs/BENCH.md).  Each mode must differ
    from exact AND from the both-rounded sim."""
    model, params = tiny_unified()
    x = synthesize_images(jax.random.PRNGKey(2), 2, 32)
    fb = (0, 1, 2)
    outs = {m: model.apply(params, x, dense=True, fast_blocks=fb,
                           simulate_fast=m)["pose_back"]
            for m in (False, True, "weights", "acts")}
    for m in (True, "weights", "acts"):
        assert float(jnp.abs(outs[m] - outs[False]).max()) > 1e-7, m
    for m in ("weights", "acts"):
        assert float(jnp.abs(outs[m] - outs[True]).max()) > 1e-7, m


@pytest.mark.heavy  # 16s
def test_calibration_reduces_loss_and_freezes_heads():
    model, params = tiny_unified()
    newp, hist = calibrate_fast_params(
        model, params, steps=40, batch=8, learning_rate=3e-5,
        fast_blocks=(0, 1, 2), seed=0)
    first = float(np.mean(hist["loss"][:5]))
    last = float(np.mean(hist["loss"][-5:]))
    assert last < first, (first, last)
    # pose heads are frozen byte-for-byte
    for name in ("head88", "head96"):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            newp[name], params[name])
    # the backbone moved
    deltas = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        newp["backbone"], params["backbone"])
    assert max(jax.tree_util.tree_leaves(deltas)) > 0.0


@pytest.mark.heavy  # 13s
def test_flagship_island_error_decomposition():
    """Pins the documented turbo-island justification (docs/BENCH.md): on
    the golden images, the all-blocks bf16 island's ACTIVATION-rounding
    component alone exceeds the 0.1 deg parity budget (so no weight
    calibration can rescue it), while the shipped turbo island (blocks
    10..15) stays inside the budget.  simulate_fast is bit-faithful to the
    MXU on CPU, so this is chip-representative and deterministic."""
    import os
    if not os.path.isdir(os.path.join(os.path.dirname(__file__), "golden")):
        pytest.skip("goldens missing")
    from headpose_tpu.pretrained import flagship_path, load_flagship
    if flagship_path() is None:
        pytest.skip("pretrained flagship missing")
    from headpose_tpu.models.anchors import FRONT_CONFIG, generate_anchors
    from headpose_tpu.models.blazeface import turbo_fast_blocks
    from headpose_tpu.ops.detection import postprocess
    from headpose_tpu.ops.image import preprocess

    model, params = load_flagship()
    anchors = jnp.asarray(generate_anchors(FRONT_CONFIG), jnp.float32)
    g = np.load(os.path.join(os.path.dirname(__file__), "golden", "e2e.npz"))
    gp = np.load(os.path.join(os.path.dirname(__file__), "golden",
                              "e2e_production.npz"))
    imgs = jnp.asarray(np.stack([g["img0"], gp["img"]]))

    def run(fb, sim):
        @jax.jit
        def pipe(p, images):
            with jax.default_matmul_precision("high"):
                x = preprocess(images, 128, "bgr")
                if sim == "exact":
                    with jax.default_matmul_precision("highest"):
                        out = model.apply(p, x)
                else:
                    out = model.apply(p, x, dense=True, fast_blocks=fb,
                                      simulate_fast=sim)
            return jax.vmap(lambda s, l, pf, pb: postprocess(
                s, l, pf, pb, anchors, score_threshold=0.4,
                iou_threshold=0.3, input_size=128, max_faces=100))(
                out["scores"], out["loc"], out["pose_front"], out["pose_back"])
        return jax.tree_util.tree_map(np.asarray, pipe(params, imgs))

    ref = run((), "exact")
    m = ref["valid"].astype(bool)

    def pose_err(out):
        mm = m & out["valid"].astype(bool)
        assert mm.any()
        return float(np.abs(out["poses"][mm] - ref["poses"][mm]).max())

    allfb = tuple(range(16))
    err_acts = pose_err(run(allfb, "acts"))       # measured 0.249
    err_both = pose_err(run(allfb, True))         # measured 0.237
    err_turbo = pose_err(run(turbo_fast_blocks(model.backbone), True))  # 0.066
    assert err_acts > 0.1, err_acts     # budget-blocking: weights can't fix
    assert err_both > 0.1, err_both
    assert err_turbo < 0.1, err_turbo   # the shipped island is inside budget
