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

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["decode_boxes", "decode_keypoints", "pairwise_iou",
           "nms_static", "gather_poses", "postprocess"]

MAX_FACES = 100          # blazeFaceDetectorH5.py:9
KEYPOINTS = 6            # :8
NUM_ANCHORS_FRONT = 512  # 16x16 grid * 2 anchors/cell
NUM_ANCHORS = 896


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


def nms_static(boxes: jax.Array, scores: jax.Array, valid: jax.Array,
               max_out: int = MAX_FACES, iou_threshold: float = 0.3,
               candidate_cap: int = 448):
    """Greedy NMS with static output shape.

    boxes (A, 4), scores (A,), valid (A,) bool → (sel_idx (max_out,),
    keep (max_out,) bool).  Semantics match tf.image.non_max_suppression
    whenever ≤ candidate_cap detections pass the score filter (anything more
    is far beyond real scenes — the reference caps OUTPUT at 100): all those
    candidates participate, and the output is the top max_out SURVIVORS,
    score-descending, compacted into a dense prefix.

    TPU cost shape: one top_k(A→C) instead of a full argsort, a C×C IoU tile
    (C=256 → 64k elements, VMEM-resident) instead of A×A, and a greedy
    lax.while_loop that exits at the first invalid candidate — trip count is
    the number of above-threshold detections (tens), not C.
    """
    num = boxes.shape[0]
    cap = min(candidate_cap, num)
    neg = jnp.asarray(-1e30, scores.dtype)
    masked = jnp.where(valid, scores, neg)
    top_scores, cand_idx = jax.lax.top_k(masked, cap)  # score-descending
    cand_valid = top_scores > neg * 0.5
    iou = pairwise_iou(boxes[cand_idx])

    def cond(state):
        i, _ = state
        return (i < cap) & cand_valid[jnp.minimum(i, cap - 1)]

    def body(state):
        i, keep = state
        before = jnp.arange(cap) < i
        suppressed = jnp.any(keep & before & (iou[:, i] > iou_threshold))
        return i + 1, keep.at[i].set(~suppressed)

    _, keep = jax.lax.while_loop(cond, body, (0, jnp.zeros((cap,), bool)))

    # compact survivors into a dense score-ordered prefix of length max_out
    pos = jnp.arange(cap)
    compact = jnp.argsort(jnp.where(keep, pos, pos + cap))[:max_out]
    return cand_idx[compact], keep[compact]


def gather_poses(sel_idx: jax.Array, pose_front: jax.Array,
                 pose_back: jax.Array) -> jax.Array:
    """Anchor indices (K,) → (K, 3) yaw/pitch/roll from the pose maps.

    Front anchors (idx < 512): 2 per cell on the 16x16 map.
    Back anchors: 6 per cell on the 8x8 map."""
    is_front = sel_idx < NUM_ANCHORS_FRONT
    cell_f = sel_idx // 2
    rf, cf = cell_f // 16, cell_f % 16
    idx_b = jnp.maximum(sel_idx - NUM_ANCHORS_FRONT, 0)
    cell_b = idx_b // 6
    rb, cb = cell_b // 8, cell_b % 8
    pf = pose_front[jnp.clip(rf, 0, 15), jnp.clip(cf, 0, 15)]
    pb = pose_back[jnp.clip(rb, 0, 7), jnp.clip(cb, 0, 7)]
    return jnp.where(is_front[:, None], pf, pb)


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
    the number of faces in frame).  Keypoints are decoded only for survivors.
    """
    logit_thr = float(np.log(score_threshold / (1.0 - score_threshold)))
    num = scores_logits.shape[0]
    neg = -jnp.inf
    remaining = jnp.where(scores_logits > logit_thr, scores_logits, neg)

    boxes = decode_boxes(loc, anchors, input_size)          # (A, 4) elementwise
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    idx_range = jnp.arange(num)

    def cond(state):
        remaining, _, count = state
        return (count < max_faces) & jnp.isfinite(jnp.max(remaining))

    def body(state):
        remaining, sel, count = state
        i = jnp.argmax(remaining)
        # IoU of the selected box against all anchors, computed on the fly
        ix1 = jnp.maximum(x1, x1[i])
        iy1 = jnp.maximum(y1, y1[i])
        ix2 = jnp.minimum(x2, x2[i])
        iy2 = jnp.minimum(y2, y2[i])
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = area + area[i] - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)
        remaining = jnp.where((iou > iou_threshold) | (idx_range == i),
                              neg, remaining)
        sel = sel.at[count].set(i)
        return remaining, sel, count + 1

    _, sel_idx, count = jax.lax.while_loop(
        cond, body, (remaining, jnp.zeros((max_faces,), jnp.int32), 0))

    keep = jnp.arange(max_faces) < count
    z = jnp.where(keep, 1.0, 0.0)
    sel_anchors = anchors[sel_idx]
    sel_loc = loc[sel_idx]
    return {
        "boxes": boxes[sel_idx] * z[:, None],
        "keypoints": decode_keypoints(sel_loc, sel_anchors, input_size)
                     * z[:, None, None],
        "scores": jax.nn.sigmoid(scores_logits[sel_idx]) * z,
        "poses": gather_poses(sel_idx, pose_front, pose_back) * z[:, None],
        "valid": keep,
    }
