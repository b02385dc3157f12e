"""Property/fuzz tests: the on-device NMS against an independent pure-numpy
greedy implementation (the tf.image.non_max_suppression semantics), across
random score/box configurations — beyond the 3 captured golden cases."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headpose_tpu.models.anchors import generate_anchors
from headpose_tpu.ops.detection import postprocess

ANCHORS = generate_anchors().astype(np.float32)


def numpy_reference(cls, loc, score_threshold, iou_threshold, max_out=100):
    """Independent greedy NMS (descending score, all candidates, lower-index
    tie-break), written against the published tf semantics."""
    thr = math.log(score_threshold / (1.0 - score_threshold))
    good = np.where(cls > thr)[0]
    cx = loc[good, 0] / 128 + ANCHORS[good, 0]
    cy = loc[good, 1] / 128 + ANCHORS[good, 1]
    w = loc[good, 2] / 128
    h = loc[good, 3] / 128
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)

    def iou(a, b):
        x1, y1 = max(a[0], b[0]), max(a[1], b[1])
        x2, y2 = min(a[2], b[2]), min(a[3], b[3])
        inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
        ua = ((a[2] - a[0]) * (a[3] - a[1])
              + (b[2] - b[0]) * (b[3] - b[1]) - inter)
        return inter / ua if ua > 0 else 0.0

    order = np.argsort(-cls[good], kind="stable")
    kept = []
    for i in order:
        if len(kept) >= max_out:
            break
        if all(iou(boxes[i], boxes[j]) <= iou_threshold for j in kept):
            kept.append(i)
    return good[kept], 1.0 / (1.0 + np.exp(-cls[good][kept]))


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("score_threshold", [0.4, 0.1])
def test_nms_matches_numpy_greedy(seed, score_threshold):
    rng = np.random.default_rng(seed)
    cls = rng.normal(loc=-3.0, scale=1.6, size=(896,)).astype(np.float32)
    hot = rng.choice(896, size=rng.integers(0, 60), replace=False)
    cls[hot] += rng.uniform(1.0, 6.0, size=len(hot)).astype(np.float32)
    loc = rng.normal(scale=8.0, size=(896, 16)).astype(np.float32)
    loc[:, 2:4] = rng.uniform(4.0, 64.0, size=(896, 2)).astype(np.float32)

    post = jax.jit(lambda s, l: postprocess(
        s, l, jnp.zeros((16, 16, 3)), jnp.zeros((8, 8, 3)),
        jnp.asarray(ANCHORS), score_threshold=score_threshold))(
        jnp.asarray(cls), jnp.asarray(loc))
    valid = np.asarray(post["valid"])
    n = int(valid.sum())
    assert valid[:n].all() and not valid[n:].any()

    ref_idx, ref_scores = numpy_reference(cls, loc, score_threshold, 0.3)
    assert n == len(ref_idx), f"count mismatch: {n} vs {len(ref_idx)}"
    np.testing.assert_allclose(np.asarray(post["scores"])[:n], ref_scores,
                               atol=1e-6)


@pytest.mark.parametrize("seed", range(4))
def test_nms_tie_break_matches_numpy_greedy(seed):
    """EXACT score ties (integer-quantized logits) — the selection argmax's
    lower-index tie-break must match the stable-sort numpy reference;
    random float scores never tie, so the parametrized fuzz above cannot
    exercise this path."""
    rng = np.random.default_rng(100 + seed)
    cls = np.round(rng.normal(loc=-1.0, scale=2.0, size=(896,))
                   ).astype(np.float32)
    loc = rng.normal(scale=8.0, size=(896, 16)).astype(np.float32)
    loc[:, 2:4] = rng.uniform(4.0, 64.0, size=(896, 2)).astype(np.float32)

    post = jax.jit(lambda s, l: postprocess(
        s, l, jnp.zeros((16, 16, 3)), jnp.zeros((8, 8, 3)),
        jnp.asarray(ANCHORS), score_threshold=0.4))(
        jnp.asarray(cls), jnp.asarray(loc))
    valid = np.asarray(post["valid"])
    n = int(valid.sum())

    ref_idx, ref_scores = numpy_reference(cls, loc, 0.4, 0.3)
    assert n == len(ref_idx), f"count mismatch: {n} vs {len(ref_idx)}"
    # with ties, score equality is necessary but not sufficient — the BOXES
    # must match too (same anchors selected in the same order)
    np.testing.assert_allclose(np.asarray(post["scores"])[:n], ref_scores,
                               atol=1e-6)
    want_boxes = np.asarray(jax.vmap(
        lambda i: jnp.asarray(ANCHORS)[i])(jnp.asarray(ref_idx)))
    got_centers = np.asarray(post["boxes"])[:n]
    # selected boxes' centers = anchor center + loc offset — check the
    # anchor identity via the decode relation
    for k, i in enumerate(ref_idx):
        cx = (got_centers[k, 0] + got_centers[k, 2]) / 2
        want_cx = loc[i, 0] / 128.0 + want_boxes[k, 0]
        np.testing.assert_allclose(cx, want_cx, atol=1e-5)


def test_saturation_at_max_faces():
    """>100 non-overlapping survivors saturate the slab at exactly 100."""
    rng = np.random.default_rng(0)
    cls = np.full((896,), 3.0, np.float32) + rng.normal(
        scale=0.01, size=896).astype(np.float32)
    loc = np.zeros((896, 16), np.float32)
    loc[:, 2:4] = 1.0  # tiny boxes at distinct anchor centers → no overlap
    post = postprocess(jnp.asarray(cls), jnp.asarray(loc),
                       jnp.zeros((16, 16, 3)), jnp.zeros((8, 8, 3)),
                       jnp.asarray(ANCHORS))
    assert int(np.asarray(post["valid"]).sum()) == 100


def test_nonfinite_scores_do_not_poison_nms():
    """A NaN or +inf score must not abort NMS or drop finite detections."""
    cls = np.full((896,), -10.0, np.float32)
    cls[5] = 3.0
    loc = np.zeros((896, 16), np.float32)
    loc[:, 2:4] = 4.0
    for bad in (np.nan, np.inf):
        c = cls.copy()
        c[700] = bad
        post = postprocess(jnp.asarray(c), jnp.asarray(loc),
                           jnp.zeros((16, 16, 3)), jnp.zeros((8, 8, 3)),
                           jnp.asarray(ANCHORS))
        valid = np.asarray(post["valid"])
        n = int(valid.sum())
        assert n >= 1, f"finite detection lost with score={bad}"
