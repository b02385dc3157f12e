"""Detection post-processing on device with static shapes.

The reference post-processes on host with dynamic shapes: np.where filtering,
a per-detection Python decode loop, and tf.image.non_max_suppression
(BlazePoser/blazeFaceDetectorH5.py:284-357).  TPU programs need static shapes,
so here the whole path — score filter, anchor decode, NMS, pose lookup — is
vectorized over all 896 anchors with a fixed MAX_FACES output slab and a
validity mask, and runs inside the same jit as the network forward.

Semantics parity (verified against tests/golden/postprocess.npz):
  * score filter in logit space:  logit > log(t / (1-t))      (:319-327)
  * decode:  cx = sx/S + ax, cy = sy/S + ay, w,h /= S; keypoints likewise
    offset by the anchor center                                (:284-317)
  * NMS: greedy by descending score, IoU > threshold suppresses (:329-335)
  * pose lookup: anchor → grid cell of its feature map; front anchors map
    2-per-cell on the 16x16 map, back anchors 6-per-cell on 8x8 (:342-353)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decode_boxes", "decode_keypoints", "pairwise_iou",
           "nms_static", "anchor_cells", "gather_poses", "postprocess",
           "score_threshold_to_logit", "sanitize_model_outputs",
           "cell_index_maps", "gather_survivor_features"]

MAX_FACES = 100          # blazeFaceDetectorH5.py:9
KEYPOINTS = 6            # :8
NUM_ANCHORS_FRONT = 512  # 16x16 grid * 2 anchors/cell


def decode_boxes(loc: jax.Array, anchors: jax.Array, input_size: int) -> jax.Array:
    """loc (..., A, 16) raw offsets + anchors (A, 4) → (..., A, 4) corner boxes
    [x1, y1, x2, y2] normalized to [0, 1]."""
    cx = loc[..., 0] / input_size + anchors[:, 0]
    cy = loc[..., 1] / input_size + anchors[:, 1]
    w = loc[..., 2] / input_size
    h = loc[..., 3] / input_size
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], axis=-1)


def decode_keypoints(loc: jax.Array, anchors: jax.Array, input_size: int) -> jax.Array:
    """loc (..., A, 16) → (..., A, 6, 2) keypoints normalized to [0, 1]."""
    kp = loc[..., 4:16].reshape(*loc.shape[:-1], KEYPOINTS, 2)
    centers = anchors[:, :2]  # (A, 2)
    return kp / input_size + centers[:, None, :]


def pairwise_iou(boxes: jax.Array) -> jax.Array:
    """(K, 4) corner boxes → (K, K) IoU matrix."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0.0, inter / union, 0.0)


def _selection_nms(remaining: jax.Array, boxes: jax.Array,
                   max_out: int, iou_threshold: float):
    """Core selection-based greedy NMS: iteratively argmax `remaining`
    (masked scores, -inf = ineligible), emit that box, suppress its
    IoU>threshold neighbours on the fly.  Exactly
    tf.image.non_max_suppression's result (greedy by descending score over
    ALL candidates, lower-index tie-break) with no sort and no pairwise-IoU
    matrix; the while_loop trip count is the number of SURVIVORS.

    Returns (sel (max_out,) int32 score-descending, count)."""
    num = remaining.shape[0]
    # robustness to pathological scores: NaN never wins an argmax nor stops
    # the loop; +inf behaves as the top candidate instead of aborting
    remaining = jnp.where(jnp.isnan(remaining), -jnp.inf, remaining)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    idx_range = jnp.arange(num)

    def cond(state):
        remaining, _, count = state
        return (count < max_out) & (jnp.max(remaining) > -jnp.inf)

    def body(state):
        remaining, sel, count = state
        i = jnp.argmax(remaining)
        ix1 = jnp.maximum(x1, x1[i])
        iy1 = jnp.maximum(y1, y1[i])
        ix2 = jnp.minimum(x2, x2[i])
        iy2 = jnp.minimum(y2, y2[i])
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = area + area[i] - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)
        remaining = jnp.where((iou > iou_threshold) | (idx_range == i),
                              -jnp.inf, remaining)
        sel = sel.at[count].set(i)
        return remaining, sel, count + 1

    _, sel, count = jax.lax.while_loop(
        cond, body, (remaining, jnp.zeros((max_out,), jnp.int32), 0))
    return sel, count


def nms_static(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
               max_out: int = MAX_FACES, iou_threshold: float = 0.3):
    """Greedy NMS with static output shape.

    boxes (A, 4) corner boxes, scores (A,), valid (A,) bool →
    (sel_idx (max_out,) score-descending, keep (max_out,) bool dense prefix).
    tf.image.non_max_suppression semantics over ALL valid candidates."""
    remaining = jnp.where(valid, scores, -jnp.inf)
    sel, count = _selection_nms(remaining, boxes, max_out, iou_threshold)
    return sel, jnp.arange(max_out) < count


def score_threshold_to_logit(score_threshold: float) -> float:
    """Probability threshold → logit threshold (sigmoid is monotone, so
    `prob > t` == `logit > logit(t)`), endpoints pinned explicitly.

    SHARED by the XLA and Pallas postprocess backends — their contract is
    bit-exactness, so the conversion must not be able to drift.  The
    `<= 0` endpoint replicates the reference's STRICT `prob > 0` filter
    (blazeFaceDetectorH5.py:319-327): f32 sigmoid underflows to exactly 0
    once e^-x overflows (x below ~-88.72), and the reference drops those
    anchors, so 'keep everything' must not keep them either (-inf here
    would).  The one representable logit AT the cutoff is dropped where the
    reference would keep it — a one-ulp boundary at probability ~3e-39."""
    if score_threshold <= 0.0:
        return -float(np.log(np.finfo(np.float32).max))
    if score_threshold >= 1.0:
        return float(np.inf)
    return float(np.log(score_threshold / (1.0 - score_threshold)))


def sanitize_model_outputs(scores_logits: jax.Array, loc: jax.Array):
    """Clamp non-finite backbone outputs BEFORE any masked-GEMM arithmetic.

    The reference filters detections with np.where and then indexes only the
    survivors (blazeFaceDetectorH5.py:319-327), so a non-finite value on a
    REJECTED anchor never reaches its outputs.  The GEMM-based extraction
    here multiplies every anchor by a 0/1 one-hot instead — and 0 * inf
    = nan would poison every detection in the image.  Clamping preserves
    the semantics of every finite-valued anchor exactly:

      * +inf logits → the largest finite logit (sigmoid == 1.0 exactly in
        f32, still selected first);
      * nan logits → -inf (fails every threshold, like the reference's
        False comparison on nan);
      * non-finite loc entries → 0 (the anchor decodes to its center box;
        if rejected it is invisible, as in the reference — if somehow
        selected its loc was already meaningless).

    SHARED by both postprocess backends (bit-exactness contract)."""
    big = float(np.log(np.finfo(np.float32).max))
    lg = jnp.where(jnp.isnan(scores_logits), -jnp.inf,
                   jnp.minimum(scores_logits, big))
    lc = jnp.where(jnp.isfinite(loc), loc, 0.0)
    return lg, lc


def anchor_cells(sel_idx: jax.Array):
    """Anchor indices → (is_front, r16, c16, r8, c8) grid coordinates.

    Front anchors (idx < NUM_ANCHORS_FRONT=512): 2 per cell on the 16x16
    map; back anchors: 6 per cell on the 8x8 map (SURVEY.md §3.1).  Rows/
    cols come back clipped into range so padded/sentinel indices index
    safely.  Single source of the anchor→cell layout — the pose lookup
    (gather_poses) and the feature extractor both use it."""
    is_front = sel_idx < NUM_ANCHORS_FRONT
    cell_f = sel_idx // 2
    rf, cf = cell_f // 16, cell_f % 16
    idx_b = jnp.maximum(sel_idx - NUM_ANCHORS_FRONT, 0)
    cell_b = idx_b // 6
    rb, cb = cell_b // 8, cell_b % 8
    return (is_front, jnp.clip(rf, 0, 15), jnp.clip(cf, 0, 15),
            jnp.clip(rb, 0, 7), jnp.clip(cb, 0, 7))


def gather_poses(sel_idx: jax.Array, pose_front: jax.Array,
                 pose_back: jax.Array) -> jax.Array:
    """Anchor indices (K,) → (K, 3) yaw/pitch/roll from the pose maps."""
    is_front, rf, cf, rb, cb = anchor_cells(sel_idx)
    pf = pose_front[rf, cf]
    pb = pose_back[rb, cb]
    return jnp.where(is_front[:, None], pf, pb)


def cell_index_maps(feat_front: jax.Array, feat_back: jax.Array):
    """Pose-map-shaped arrays whose channel 0 carries the FLAT CELL INDEX
    (front cells first, back offset by the front count — the layout of the
    postprocess pose table).

    The survivors-only head profile (runtime.detector head_eval='survivors')
    feeds these to the postprocess *in place of* the real pose maps: both
    backends extract "poses" per survivor with exact arithmetic (one-hot
    GEMMs at HIGHEST / masked sums of one-hot masks), so small integers pass
    through bit-exactly and the per-survivor channel 0 comes back as the
    survivor's cell index — without either backend growing a second output
    contract.  Invalid slots return 0 (a real cell index!); always gate on
    the `valid` mask before decoding."""
    B, hf, wf = feat_front.shape[:3]
    hb, wb = feat_back.shape[1:3]
    nf = hf * wf
    mf = jnp.zeros((hf, wf, 3), jnp.float32).at[..., 0].set(
        jnp.arange(nf, dtype=jnp.float32).reshape(hf, wf))
    mb = jnp.zeros((hb, wb, 3), jnp.float32).at[..., 0].set(
        nf + jnp.arange(hb * wb, dtype=jnp.float32).reshape(hb, wb))
    return (jnp.broadcast_to(mf, (B, hf, wf, 3)),
            jnp.broadcast_to(mb, (B, hb, wb, 3)))


def gather_survivor_features(cells: jax.Array, valid: jax.Array,
                             feat_front: jax.Array, feat_back: jax.Array):
    """Flat cell indices (B, F) + validity mask → per-survivor feature
    vectors from both backbone taps.

    Returns (vec_front (B, F, C88), vec_back (B, F, C96), is_front (B, F)):
    each row is the feature vector at the survivor's grid cell — exactly
    what the reference's feature-extraction pipeline stored per detected
    face (SURVEY.md §2.15) and what every pose head trained/evaluated on.
    Rows of the OTHER map (and invalid slots) are zero.

    Layout: one-hot (B, F, cells) @ (B, cells, C) batched GEMMs at HIGHEST —
    bit-exact row selection, same trick as the postprocess pose-table
    gather (a (B*F,)-row gather would relayout; the one-hot GEMM fuses)."""
    B, hf, wf, cf_ = feat_front.shape
    hb, wb, cb_ = feat_back.shape[1:]
    nf, nb = hf * wf, hb * wb
    is_front = cells < nf
    z = valid & is_front
    ohf = ((cells[..., None] == jnp.arange(nf)[None, None, :])
           & z[..., None]).astype(jnp.float32)                    # (B, F, nf)
    zb = valid & ~is_front
    ohb = (((cells - nf)[..., None] == jnp.arange(nb)[None, None, :])
           & zb[..., None]).astype(jnp.float32)                   # (B, F, nb)
    vec_front = jnp.einsum("bfc,bcd->bfd", ohf,
                           feat_front.reshape(B, nf, cf_),
                           precision=_HIGHEST)
    vec_back = jnp.einsum("bfc,bcd->bfd", ohb,
                          feat_back.reshape(B, nb, cb_),
                          precision=_HIGHEST)
    return vec_front, vec_back, is_front


@functools.lru_cache(maxsize=None)
def _decode_matrix(input_size: int) -> np.ndarray:
    """(16, 16) matrix M such that `loc @ M + bias(anchors)` decodes raw SSD
    offsets into [x1, y1, x2, y2, kx1, ky1, ..., kx6, ky6] (all normalized).

    The reference decode (blazeFaceDetectorH5.py:284-317) is affine in the
    raw loc vector, so on TPU the whole decode is ONE MXU matmul over all
    anchors instead of 20 strided slice/stack relayouts on a 16-wide minor
    dim (measured 0.7 ms/256-batch as elementwise vs ~0.05 ms as a GEMM).
    """
    s = 1.0 / input_size
    m = np.zeros((16, 16), np.float32)
    m[0, 0] = m[0, 2] = s          # cx appears in x1 and x2
    m[1, 1] = m[1, 3] = s          # cy in y1, y2
    m[2, 0], m[2, 2] = -0.5 * s, 0.5 * s   # w: -w/2 in x1, +w/2 in x2
    m[3, 1], m[3, 3] = -0.5 * s, 0.5 * s   # h
    for k in range(KEYPOINTS):
        m[4 + 2 * k, 4 + 2 * k] = s        # kx_k
        m[5 + 2 * k, 5 + 2 * k] = s        # ky_k
    return m


def _decode_bias(anchors: jax.Array) -> jax.Array:
    """(A, 16) anchor-center bias matching `_decode_matrix`'s output layout:
    every output column is offset by the anchor's cx or cy."""
    ax, ay = anchors[:, 0], anchors[:, 1]
    return jnp.stack([ax, ay] * 8, axis=-1)


_HIGHEST = jax.lax.Precision.HIGHEST


def postprocess(scores_logits: jax.Array, loc: jax.Array,
                pose_front: jax.Array, pose_back: jax.Array,
                anchors: jax.Array, *,
                score_threshold: float = 0.4, iou_threshold: float = 0.3,
                input_size: int = 128, max_faces: int = MAX_FACES):
    """Single-image post-process: (896,) logits, (896, 16) loc, pose maps →
    dict of fixed-size arrays {boxes (F,4), keypoints (F,6,2), scores (F,),
    poses (F,3), valid (F,)}.  vmap over the batch dimension.

    NMS runs as SELECTION-based greedy: iteratively argmax the remaining
    scores, emit that box, and suppress its >IoU-threshold neighbours on the
    fly.  This is exactly tf.image.non_max_suppression's result (greedy by
    descending score over ALL candidates, ties broken by lower index) with
    no sort, no top-k, no pairwise-IoU matrix, and no candidate cap — the
    while_loop trip count is the number of SURVIVORS (≤ max_faces, typically
    the number of faces in frame).

    TPU layout strategy: decode is affine in loc, so boxes+keypoints decode
    is one (A,16)@(16,16) MXU matmul; survivor extraction is a one-hot
    (F,A)@(A,·) matmul instead of row gathers (gathers relayout ~2.5 ms per
    256-batch; the one-hot GEMM fuses and is ~10x cheaper).  Both matmuls
    run at HIGHEST precision: one-hot selection is then bit-exact and decode
    matches the reference formula to ≤1 ulp.
    """
    scores_logits, loc = sanitize_model_outputs(scores_logits, loc)
    logit_thr = score_threshold_to_logit(score_threshold)
    remaining = jnp.where(scores_logits > logit_thr, scores_logits, -jnp.inf)

    num = scores_logits.shape[0]
    decoded = jnp.dot(loc, _decode_matrix(input_size),
                      precision=_HIGHEST) + _decode_bias(anchors)   # (A, 16)
    sel_idx, count = _selection_nms(remaining, decoded[:, :4],
                                    max_faces, iou_threshold)

    keep = jnp.arange(max_faces) < count
    z = jnp.where(keep, 1.0, 0.0)
    # one-hot selection matrix, zeroed rows for the invalid tail
    onehot = jnp.where((sel_idx[:, None] == jnp.arange(num)[None, :]) &
                       keep[:, None], 1.0, 0.0)                      # (F, A)
    sel_dec = jnp.dot(onehot, decoded, precision=_HIGHEST)           # (F, 16)
    # extraction operand keeps only threshold-passing logits: a selected
    # anchor always passed the threshold (so its value is unchanged), while
    # a non-finite logit on an UNSELECTED anchor would otherwise poison the
    # whole image through the GEMM (0 * nan = nan, 0 * -inf = nan) — the
    # reference's np.where filter drops such anchors before any arithmetic
    # (blazeFaceDetectorH5.py:319-327), so clean scores are the parity
    # behavior (and what the fused Pallas kernel computes)
    safe_logits = jnp.where(scores_logits > logit_thr, scores_logits, 0.0)
    sel_logits = jnp.dot(onehot, safe_logits[:, None],
                         precision=_HIGHEST)[:, 0]                   # (F,)

    # pose lookup: anchor → flat cell in [front 16x16 | back 8x8] table
    pose_table = jnp.concatenate([pose_front.reshape(-1, 3),
                                  pose_back.reshape(-1, 3)], axis=0)  # (320, 3)
    n_front_cells = pose_front.shape[0] * pose_front.shape[1]
    # flat cell via the single-source anchor→cell walk (anchor_cells)
    is_front, rf, cf, rb, cb = anchor_cells(sel_idx)
    cell = jnp.where(is_front, rf * pose_front.shape[1] + cf,
                     n_front_cells + rb * pose_back.shape[1] + cb)
    cell_onehot = jnp.where(
        (cell[:, None] == jnp.arange(pose_table.shape[0])[None, :]) &
        keep[:, None], 1.0, 0.0)                                     # (F, 320)
    poses = jnp.dot(cell_onehot, pose_table, precision=_HIGHEST)     # (F, 3)

    return {
        "boxes": sel_dec[:, :4],
        "keypoints": sel_dec[:, 4:].reshape(max_faces, KEYPOINTS, 2),
        "scores": jax.nn.sigmoid(sel_logits) * z,
        "poses": poses,
        "valid": keep,
    }
