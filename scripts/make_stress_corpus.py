"""Build the BOUNDARY-stress parity corpus (tests/golden/stress_corpus.npz).

The primary parity corpus (make_parity_corpus.py) certifies the serving modes
on detection-rich but *comfortable* inputs: score caps in [0.50, 0.998], 1-5
well-separated faces.  This corpus attacks the three contract boundaries
where float-mode divergence would first flip a detection set
(VERDICT r3 item 3):

  * axis "threshold": per-target score caps pulled TO logit(0.4) +/- a small
    band (uniform in score [0.36, 0.46]) — ascent uses a squared pull-to-cap
    loss instead of the capped-max, so after uint8 rounding the final logits
    genuinely straddle the production threshold 0.4
    (blazeFaceDetectorH5.py:82, :319-327).
  * axis "nms": 2-3-target clusters whose DECODED boxes are shaped (via an
    IoU penalty through decode_boxes) to pairwise IoU in [0.25, 0.35] —
    straddling the greedy-NMS suppression boundary iou > 0.3 (:329-335).
  * axis "saturation": 20-48 targets per image packed into a RESTRICTED
    24-macro-cell set (multiple anchors per cell, both SSD grids, same-cell
    pairs IoU-shaped apart so they survive NMS) — approaching the
    MAX_FACE_NUM=100 slab (:8-9) far beyond the primary corpus's max of 5.
  * axis "overflow" (round 5): 150-200 targets with every same/adjacent-cell
    pair IoU-shaped below the suppression boundary, so well OVER 100
    mutually-surviving candidates reach the reference's
    tf.image.non_max_suppression(max_output_size=MAX_FACE_NUM=100) (:332)
    and its TRUNCATION behavior — survivor identity and emission order at
    the cap — is finally exercised end to end.  The reference's UNCAPPED
    survivor sets (max_output_size=896) are captured alongside (ov_* arrays)
    so certification can prove the cap genuinely bit (uncapped count > 100)
    and that the full survivor set agrees, not just the truncated prefix.

Reference outputs are captured by driving the reference pipeline itself
(detectFaces, tf-keras) on the SAME uint8 images at production settings.
Images whose reference detection count is 0 are KEPT on the threshold axis —
"we also detect nothing" is exactly the agreement being certified there.

Run on the chip:  python scripts/make_stress_corpus.py     (4 ascent
compiles ~2-4 min each, then tf-keras capture)
"""
from __future__ import annotations

import hashlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, _HERE)
OUT = os.path.join(REPO, "tests", "golden", "stress_corpus.npz")

SIZE = 128
SEED = 777
N_THRESHOLD = 36
N_NMS = 36
N_SATURATION = 24
N_OVERFLOW = 12
ASCENT_STEPS = 700
ASCENT_STEPS_OVERFLOW = 3000   # ~190 competing targets need a longer climb


def _front_anchor(rng, r8, c8):
    r16 = 2 * r8 + int(rng.integers(2))
    c16 = 2 * c8 + int(rng.integers(2))
    return (r16 * 16 + c16) * 2 + int(rng.integers(2))


def _back_anchor(rng, r8, c8):
    return 512 + (r8 * 8 + c8) * 6 + int(rng.integers(6))


def _any_anchor(rng, cell):
    r8, c8 = int(cell) // 8, int(cell) % 8
    return (_front_anchor(rng, r8, c8) if rng.random() < 0.5
            else _back_anchor(rng, r8, c8))


def targets_threshold(rng):
    """1-5 separated faces, every cap inside the threshold-straddling band."""
    lo, hi = np.log(0.36 / 0.64), np.log(0.46 / 0.54)
    k = int(rng.integers(1, 6))
    cells = rng.choice(64, size=k, replace=False)
    anchors = [_any_anchor(rng, c) for c in cells]
    caps = rng.uniform(lo, hi, size=k)
    return anchors, caps.tolist(), [], [], []


def targets_nms(rng):
    """1-2 clusters of 2-3 targets in ADJACENT macro-cells; cluster pairs get
    an IoU target in [0.25, 0.35].  Scores comfortably above threshold."""
    n_clusters = int(rng.integers(1, 3))
    anchors, caps, pa, pb, piou = [], [], [], [], []
    used = set()
    for _ in range(n_clusters):
        while True:
            r8, c8 = int(rng.integers(7)), int(rng.integers(7))
            if (r8, c8) not in used:
                break
        size = int(rng.integers(2, 4))
        cells = [(r8, c8), (r8, c8 + 1), (r8 + 1, c8)][:size]
        used.update(cells)
        base = len(anchors)
        for (r, c) in cells:
            anchors.append(_front_anchor(rng, r, c) if rng.random() < 0.5
                           else _back_anchor(rng, r, c))
            caps.append(float(rng.uniform(1.0, 2.5)))   # scores ~0.73-0.92
        for j in range(base + 1, len(anchors)):
            pa.append(base)
            pb.append(j)
            piou.append(float(rng.uniform(0.25, 0.35)))
    return anchors, caps, pa, pb, piou


def _cell_anchor_ids(r8, c8):
    """All 14 anchor slots of one 8x8 macro-cell: 8 front (the 2x2 16-grid
    cells x 2 anchors each) + 6 back."""
    ids = []
    for dr in (0, 1):
        for dc in (0, 1):
            base = ((2 * r8 + dr) * 16 + (2 * c8 + dc)) * 2
            ids += [base, base + 1]
    base_b = 512 + (r8 * 8 + c8) * 6
    return ids + [base_b + j for j in range(6)]


def _anchor_macro_cell(a: int):
    """Anchor id → its 8x8 macro-cell (r8, c8)."""
    if a < 512:
        r16, c16 = divmod(a // 2, 16)
        return r16 // 2, c16 // 2
    r8, c8 = divmod((a - 512) // 6, 8)
    return r8, c8


def _separation_pairs(anchors, rng, lo=0.03, hi=0.18, max_dist=1):
    """IoU-shaping pairs for every same/adjacent-macro-cell target pair:
    pull their decoded boxes to a LOW IoU so near-neighbours survive greedy
    NMS instead of suppressing each other.  Returns position pairs (into
    the anchors list) + per-pair IoU targets."""
    cells = [_anchor_macro_cell(a) for a in anchors]
    pa, pb, piou = [], [], []
    for i in range(len(anchors)):
        for j in range(i + 1, len(anchors)):
            if (abs(cells[i][0] - cells[j][0]) <= max_dist
                    and abs(cells[i][1] - cells[j][1]) <= max_dist):
                pa.append(i)
                pb.append(j)
                piou.append(float(rng.uniform(lo, hi)))
    return pa, pb, piou


def targets_saturation(rng):
    """20-48 targets packed into a RESTRICTED 24-macro-cell set, anchors
    sampled WITHOUT replacement per cell so multiple anchors per macro-cell
    (and both grids in one cell) genuinely occur — the r4 second-grid branch
    was dead code and every cell held at most one target (ADVICE r4).
    Same-cell pairs are IoU-shaped apart so they survive NMS."""
    k = int(rng.integers(20, 49))
    cells = rng.choice(64, size=24, replace=False)
    pool = []
    for c in cells:
        pool += _cell_anchor_ids(int(c) // 8, int(c) % 8)
    anchors = [int(a) for a in rng.choice(np.array(pool), size=k,
                                          replace=False)]
    caps = rng.uniform(0.5, 5.0, size=k).tolist()       # scores ~0.62-0.99
    pa, pb, piou = _separation_pairs(anchors, rng, max_dist=0)
    return anchors, caps, pa, pb, piou


def targets_overflow(rng):
    """~160 targets spread EVENLY over the image (per macro-cell: two front
    anchors from different 16-grid cells, plus a back anchor in half the
    cells), same/adjacent-cell pairs IoU-shaped below the 0.3 suppression
    boundary: at the saturation axis's observed ~58% target→survivor yield
    this lands >100 mutually-surviving candidates at the reference NMS,
    exercising its max_output_size=MAX_FACE_NUM truncation
    (blazeFaceDetectorH5.py:332).  The first random-placement attempt
    (150-200 uniform anchors, sum-normalized losses) collapsed to ~4
    detections/image — crowding + the ~2300-pair summed IoU penalty
    drowning the score term; this axis therefore uses MEAN-normalized
    losses in synthesize()."""
    # FRONT-ONLY, 2 targets per macro-cell on DIAGONAL 16-grid sub-cells =
    # 128 targets at >=11.3px pitch.  Probed dead ends, for the record:
    # a 128-point checkerboard at 11px uniform pitch fails at the
    # PERCEPTION level (~11/128 cross threshold — faces cannot pack that
    # tight visually); adding back-grid anchors is unsatisfiable under the
    # separation hinge (a back center sits 5.66px from four front centers
    # — near-coincident boxes cannot reach low IoU, and the conflicting
    # gradients collapse the whole image to ~6 survivors); hard box-size
    # targets crush the score ascent (size and score are entangled).
    anchors = []
    for cell in range(64):
        r8, c8 = cell // 8, cell % 8
        diag = ((0, 0), (1, 1)) if rng.random() < 0.5 else ((0, 1), (1, 0))
        for dr, dc in diag:
            base = ((2 * r8 + dr) * 16 + (2 * c8 + dc)) * 2
            anchors.append(base + int(rng.integers(2)))
    # caps are score FLOORS here (hinge: relu(cap - hit), varied so the
    # truncation order is score-diverse); scores land ~0.77-0.95
    caps = rng.uniform(1.2, 3.0, size=len(anchors)).tolist()
    # no pair list: this axis uses the FULL-pairwise hinge separation
    # penalty in synthesize() (every target pair pushed below IoU 0.2)
    return anchors, caps, [], [], []


def synthesize(axis: str, n_images: int, seed: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp
    import optax

    from headpose_tpu.models.anchors import generate_anchors
    from headpose_tpu.ops.detection import decode_boxes
    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.pretrained import load_flagship

    model, params = load_flagship()
    anchors_tbl = jnp.asarray(generate_anchors(), jnp.float32)
    rng = np.random.default_rng(seed)
    gen = {"threshold": targets_threshold, "nms": targets_nms,
           "saturation": targets_saturation,
           "overflow": targets_overflow}[axis]
    picks = [gen(rng) for _ in range(n_images)]
    m = max(len(p[0]) for p in picks)
    np_pairs = max(max((len(p[3]) for p in picks), default=0), 1)
    idx = np.zeros((n_images, m), np.int32)
    cap = np.zeros((n_images, m), np.float32)
    w = np.zeros((n_images, m), np.float32)
    pa = np.zeros((n_images, np_pairs), np.int32)
    pb = np.zeros((n_images, np_pairs), np.int32)
    piou = np.zeros((n_images, np_pairs), np.float32)
    pw = np.zeros((n_images, np_pairs), np.float32)
    for i, (a, c, qa, qb, qi) in enumerate(picks):
        idx[i, :len(a)] = a
        cap[i, :len(c)] = c
        w[i, :len(a)] = 1.0
        # pair entries are POSITIONS into the target list; the IoU penalty
        # indexes the (N, 896, 4) decoded-box table, so convert to ANCHOR
        # ids here (r4 stored positions raw — the shaping penalty paired
        # boxes of anchors 0..k instead of the targets')
        aa = np.asarray(a, np.int32)
        pa[i, :len(qa)] = aa[qa]
        pb[i, :len(qb)] = aa[qb]
        piou[i, :len(qi)] = qi
        pw[i, :len(qi)] = 1.0

    idx, cap, w = jnp.asarray(idx), jnp.asarray(cap), jnp.asarray(w)
    pa, pb = jnp.asarray(pa), jnp.asarray(pb)
    piou, pw = jnp.asarray(piou), jnp.asarray(pw)
    pull = axis == "threshold"
    # overflow: ~160 targets and ~10^3 shaping pairs per image — the summed
    # IoU penalty would drown the score term (first attempt: 4 dets/image),
    # so that axis normalizes both terms to per-target/per-pair MEANS
    norm_w = 1.0 / max(float(w.sum() / len(w)), 1.0) if axis == "overflow" else 1.0
    norm_p = 1.0 / max(float(pw.sum() / len(pw)), 1.0) if axis == "overflow" else 1.0
    iou_weight = 3.0 if axis == "overflow" else 50.0
    opt = optax.adam(0.08)

    def loss_fn(z):
        imgs = jax.nn.sigmoid(z) * 255.0
        with jax.default_matmul_precision("highest"):
            x = preprocess(imgs, SIZE, "bgr")
            out = model.apply(params, x, heads=False)
        hit = jnp.take_along_axis(out["scores"], idx, axis=1)
        if pull:
            # squared pull TOWARD the cap: final logits sit AT the band,
            # uint8 rounding then jitters them across the 0.4 threshold
            score_loss = jnp.sum(w * (hit - cap) ** 2)
        elif axis == "overflow":
            # hinge to a varied score FLOOR: once a target clears its cap
            # the gradient stops, freeing the whole budget for the
            # separation term (overdriving 160 logits to 0.99 fights it)
            score_loss = norm_w * jnp.sum(w * jnp.maximum(cap - hit, 0.0))
        else:
            score_loss = -norm_w * jnp.sum(w * jnp.minimum(hit, cap + 0.8))
        boxes = decode_boxes(out["loc"], anchors_tbl, SIZE)  # (N, 896, 4)
        ba = jnp.take_along_axis(boxes, pa[:, :, None], axis=1)
        bb = jnp.take_along_axis(boxes, pb[:, :, None], axis=1)
        x1 = jnp.maximum(ba[..., 0], bb[..., 0])
        y1 = jnp.maximum(ba[..., 1], bb[..., 1])
        x2 = jnp.minimum(ba[..., 2], bb[..., 2])
        y2 = jnp.minimum(ba[..., 3], bb[..., 3])
        inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
        area = lambda b: jnp.maximum(b[..., 2] - b[..., 0], 0.0) * \
            jnp.maximum(b[..., 3] - b[..., 1], 0.0)
        union = area(ba) + area(bb) - inter
        iou = inter / jnp.maximum(union, 1e-9)
        iou_loss = norm_p * jnp.sum(pw * (iou - piou) ** 2)
        loss = score_loss + iou_weight * iou_loss
        if axis == "overflow":
            # FULL-pairwise hinge separation: every target pair's IoU
            # pushed below 0.2 (clear of the 0.3 suppression boundary),
            # leaving the optimizer free to pick any feasible geometry.
            # (Probed alternatives both failed: listed-pair penalties left
            # median-28px boxes that NMS'd to ~47 survivors; a direct
            # 12px box-size penalty crushed the score ascent to ~12
            # above-threshold targets — size and score are entangled.)
            tb = jnp.take_along_axis(boxes, idx[:, :, None], axis=1)
            x1 = jnp.maximum(tb[:, :, None, 0], tb[:, None, :, 0])
            y1 = jnp.maximum(tb[:, :, None, 1], tb[:, None, :, 1])
            x2 = jnp.minimum(tb[:, :, None, 2], tb[:, None, :, 2])
            y2 = jnp.minimum(tb[:, :, None, 3], tb[:, None, :, 3])
            inter2 = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
            ar = jnp.maximum(tb[..., 2] - tb[..., 0], 0.0) * \
                jnp.maximum(tb[..., 3] - tb[..., 1], 0.0)
            union2 = ar[:, :, None] + ar[:, None, :] - inter2
            iou2 = inter2 / jnp.maximum(union2, 1e-9)
            mask = (w[:, :, None] * w[:, None, :]
                    * (1.0 - jnp.eye(w.shape[1])[None]))
            hinge = jnp.maximum(iou2 - 0.2, 0.0)
            sep = jnp.sum(mask * hinge ** 2) / jnp.maximum(jnp.sum(w), 1.0)
            loss = loss + 50.0 * sep
        return loss

    steps = ASCENT_STEPS_OVERFLOW if axis == "overflow" else ASCENT_STEPS

    @jax.jit
    def run(z):
        state = opt.init(z)

        def step(_, carry):
            z, state = carry
            g = jax.grad(loss_fn)(z)
            updates, state = opt.update(g, state)
            return optax.apply_updates(z, updates), state

        z, _ = jax.lax.fori_loop(0, steps, step, (z, state))
        return jax.nn.sigmoid(z) * 255.0

    z0 = jnp.zeros((n_images, SIZE, SIZE, 3), jnp.float32)
    imgs = np.asarray(run(z0))
    return np.clip(np.rint(imgs), 0, 255).astype(np.uint8)


def capture_uncapped(imgs: np.ndarray):
    """Reference detectFaces with the NMS cap effectively REMOVED
    (MAX_FACE_NUM monkeypatched to the full anchor count) — the uncapped
    survivor sets that prove the production cap genuinely truncated."""
    import blazeFaceDetectorH5 as bfd
    from make_parity_corpus import capture_reference

    saved = bfd.MAX_FACE_NUM
    bfd.MAX_FACE_NUM = 896
    try:
        return capture_reference(imgs)
    finally:
        bfd.MAX_FACE_NUM = saved


def main():
    from make_parity_corpus import capture_reference

    all_imgs, all_axis = [], []
    for axis, n, seed in (("threshold", N_THRESHOLD, SEED),
                          ("nms", N_NMS, SEED + 1),
                          ("saturation", N_SATURATION, SEED + 2),
                          ("overflow", N_OVERFLOW, SEED + 3)):
        steps = ASCENT_STEPS_OVERFLOW if axis == "overflow" else ASCENT_STEPS
        print(f"synthesizing {n} '{axis}' images ({steps} ascent steps)...",
              flush=True)
        if axis == "overflow":
            # synthesize in BATCHES OF 4: the ascent trajectory is chaotic
            # in XLA batch-tiling numerics, and batch-4 programs land
            # 116-131 uncapped survivors where a batch-12 program of the
            # same seeds plateaus at 82-94 (measured on-chip, both
            # verified against the reference) — chunking reproduces the
            # good dynamics deterministically
            for i in range(0, n, 4):
                all_imgs.append(synthesize(axis, min(4, n - i), seed + i))
        else:
            all_imgs.append(synthesize(axis, n, seed))
        all_axis += [axis] * n
    imgs = np.concatenate(all_imgs)
    axes = np.array(all_axis)

    print("capturing reference outputs (tf-keras, threshold 0.4)...",
          flush=True)
    results, counts = capture_reference(imgs)

    # keep zero-detection images ONLY on the threshold axis (agreement on
    # "nothing crossed" is the point there); elsewhere the targets missed
    keep = (counts > 0) | (axes == "threshold")
    imgs, counts, axes = imgs[keep], counts[keep], axes[keep]
    results = [r for r, k in zip(results, keep) if k]
    n, maxd = len(imgs), max(int(counts.max()), 1)
    for axis in ("threshold", "nms", "saturation", "overflow"):
        sel = axes == axis
        print(f"  {axis}: {int(sel.sum())} images, "
              f"{int(counts[sel].sum())} reference detections "
              f"(max/image {int(counts[sel].max())})")
    assert (counts[axes == "saturation"] >= 15).any(), \
        "saturation axis never reached 15 detections — raise caps/steps"
    n_capped = int((counts[axes == "overflow"] == 100).sum())
    assert n_capped >= max(1, (axes == "overflow").sum() // 2), (
        f"only {n_capped} overflow images hit the MAX_FACE_NUM=100 cap — "
        "raise targets/caps/steps")

    boxes = np.zeros((n, maxd, 4), np.float32)
    keypoints = np.zeros((n, maxd, 6, 2), np.float32)
    scores = np.zeros((n, maxd), np.float32)
    poses = np.zeros((n, maxd, 3), np.float32)
    for i, r in enumerate(results):
        c = counts[i]
        if c:
            boxes[i, :c] = np.asarray(r.boxes, np.float32)
            keypoints[i, :c] = np.asarray(r.keypoints, np.float32)
            scores[i, :c] = np.asarray(r.scores, np.float32)
            poses[i, :c] = np.asarray(r.poses, np.float32)

    # overflow axis: also capture the reference's UNCAPPED survivor sets
    ov_idx = np.where(axes == "overflow")[0].astype(np.int32)
    print(f"capturing UNCAPPED reference outputs on {len(ov_idx)} "
          "overflow images (MAX_FACE_NUM -> 896)...", flush=True)
    ov_results, ov_counts = capture_uncapped(imgs[ov_idx])
    assert (ov_counts >= counts[ov_idx]).all()
    # genuinely TRUNCATED = uncapped survivors exceed the cap (an image
    # whose uncapped NMS yields exactly 100 was never cut)
    n_truncated = int((ov_counts > 100).sum())
    assert n_truncated >= max(1, len(ov_idx) // 2), (
        f"only {n_truncated} overflow images genuinely truncate "
        "(uncapped > 100) — raise targets/caps/steps")
    ov_max = int(ov_counts.max())
    ov_boxes = np.zeros((len(ov_idx), ov_max, 4), np.float32)
    ov_scores = np.zeros((len(ov_idx), ov_max), np.float32)
    ov_poses = np.zeros((len(ov_idx), ov_max, 3), np.float32)
    for i, r in enumerate(ov_results):
        c = ov_counts[i]
        ov_boxes[i, :c] = np.asarray(r.boxes, np.float32)
        ov_scores[i, :c] = np.asarray(r.scores, np.float32)
        ov_poses[i, :c] = np.asarray(r.poses, np.float32)
    print(f"  uncapped survivors/image: min {int(ov_counts.min())}, "
          f"max {ov_max}; {n_truncated} images truncated at the cap")

    np.savez_compressed(OUT, imgs=imgs, axis=axes, counts=counts,
                        boxes=boxes, keypoints=keypoints, scores=scores,
                        poses=poses, ov_idx=ov_idx, ov_counts=ov_counts,
                        ov_boxes=ov_boxes, ov_scores=ov_scores,
                        ov_poses=ov_poses)
    sha = hashlib.sha256(open(OUT, "rb").read()).hexdigest()
    print(f"wrote {OUT} ({os.path.getsize(OUT)/1e6:.1f} MB, "
          f"sha256 {sha[:16]}...)")


if __name__ == "__main__":
    main()
