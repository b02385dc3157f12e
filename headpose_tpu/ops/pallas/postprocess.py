"""Fused detection postprocess kernel (Pallas / Mosaic, TPU v5e).

Replaces the XLA tail of ops/detection.postprocess — score threshold, greedy
selection-NMS, survivor extraction, pose lookup — with ONE kernel.  The XLA
version is already GEMM-shaped (r2), but it pays two costs the kernel
removes:

  * the batched `lax.while_loop` NMS executes ~6 small HBM-round-trip ops
    per iteration, serialized;
  * survivor extraction materializes a (B, F, A) one-hot operand
    (~45 MB at batch 128) for the selection matmuls.

Kernel layout: BATCH IN LANES (128 images per kernel instance — the chip's
native tile width, see docs/BENCH.md "the >128 cliff"), anchors along
sublanes (A=896 = 112×8).  Per while-iteration (trip count = max survivors
over the 128 lanes, NOT max_faces):

  argmax-by-score per lane → first-occurrence row (tf NMS tie-break: lowest
  index) → masked-sum extraction of the selected row's 16 decoded values +
  3 pose angles + logit (all VMEM-resident) → IoU suppression of the
  selected row's neighbours → dynamic store into the (F, 24, 128) output
  slab.

The box/keypoint decode and the per-anchor pose table stay in XLA as GEMMs
(MXU work at HIGHEST precision, ops/detection.py) — the kernel fuses the
latency-bound selection chain, not the matmuls.

Semantics: identical to ops.detection.postprocess (greedy by descending
score over ALL candidates, lower-index tie-break, IoU > threshold
suppresses; fixed MAX_FACES slab + validity mask) — fuzz-tested against it
in tests/test_pallas.py.

Multi-chip: a compiled pallas_call is an opaque custom call to XLA's
sharding propagation, so under a plain dp-sharded jit it would force
replication instead of partitioning.  FaceDetector built with a
`mesh=` therefore wraps this function in `jax.shard_map` over the data
axis — each device runs the kernel on its local batch shard, numerically
identical to the XLA postprocess (tests/test_parallel.py::
test_sharded_pallas_postprocess_numeric_parity).  Without a mesh, the
detector's 'auto' mode selects the kernel only when
jax.device_count() == 1.

Reference behavior: BlazePoser/blazeFaceDetectorH5.py:284-357.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..detection import (KEYPOINTS, MAX_FACES, NUM_ANCHORS_FRONT,
                         _decode_bias, _decode_matrix, anchor_cells,
                         sanitize_model_outputs, score_threshold_to_logit)

__all__ = ["postprocess_pallas"]

LANES = 128          # images per kernel instance
_NEG = -jnp.inf
# output channel map: 16 decoded values, 3 pose angles, logit, valid, pad
_C_DEC, _C_POSE, _C_LOGIT, _C_VALID, _CH = 0, 16, 19, 20, 24


def _nms_kernel(a: int, max_out: int, iou_threshold: float, logit_thr: float,
                logits_ref, dec_ref, pose_ref, out_ref):
    """Refs (leading grid-block dim of 1): logits (1, A, L) f32;
    dec (1, 16, A, L); pose (1, 3, A, L); out (1, F8, 24, L)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (a, LANES), 0)

    out_ref[...] = jnp.zeros_like(out_ref)

    logits = logits_ref[0]
    # NaN never passes the threshold compare; padded lanes carry -inf.
    # Keep a finite copy for masked-sum extraction (-inf * 0 = nan).
    remaining0 = jnp.where(logits > logit_thr, logits, _NEG)
    logit_vals = jnp.where(logits > logit_thr, logits, 0.0)
    x1 = dec_ref[0, 0]
    y1 = dec_ref[0, 1]
    x2 = dec_ref[0, 2]
    y2 = dec_ref[0, 3]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    def cond(state):
        t, remaining = state
        return (t < max_out) & (jnp.max(remaining) > _NEG)

    def body(state):
        t, remaining = state
        m = jnp.max(remaining, axis=0, keepdims=True)            # (1, L)
        active = m > _NEG
        # tf tie-break: the LOWEST index among score ties wins
        selrow = jnp.min(jnp.where(remaining == m, row, a),
                         axis=0, keepdims=True)                  # (1, L)
        mask = (row == selrow) & active                          # (A, L)
        maskf = mask.astype(jnp.float32)

        def pick(arr):
            return jnp.sum(arr * maskf, axis=0, keepdims=True)   # (1, L)

        bx1, by1, bx2, by2 = pick(x1), pick(y1), pick(x2), pick(y2)
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        ix1 = jnp.maximum(x1, bx1)
        iy1 = jnp.maximum(y1, by1)
        ix2 = jnp.minimum(x2, bx2)
        iy2 = jnp.minimum(y2, by2)
        inter = jnp.maximum(ix2 - ix1, 0.0) * jnp.maximum(iy2 - iy1, 0.0)
        union = area + barea - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)
        suppress = (iou > iou_threshold) | mask
        remaining = jnp.where(active & suppress, _NEG, remaining)

        # extract ALL channels of the selected row as TWO sublane
        # reductions (masked multiply + sum over the anchor dim) and write
        # them in FOUR dynamic stores — not 21 of each, which multiplies
        # Mosaic compile time and per-iteration dispatch work
        dec_pick = jnp.sum(dec_ref[0] * maskf[None], axis=1)     # (16, L)
        pose_pick = jnp.sum(pose_ref[0] * maskf[None], axis=1)   # (3, L)
        out_ref[0, pl.ds(t, 1), _C_DEC:_C_POSE, :] = dec_pick[None]
        out_ref[0, pl.ds(t, 1), _C_POSE:_C_LOGIT, :] = pose_pick[None]
        out_ref[0, pl.ds(t, 1), _C_LOGIT:_C_LOGIT + 1, :] = pick(logit_vals)[None]
        out_ref[0, pl.ds(t, 1), _C_VALID:_C_VALID + 1, :] = (
            active.astype(jnp.float32)[None])
        return t + 1, remaining

    jax.lax.while_loop(cond, body, (0, remaining0))


@functools.lru_cache(maxsize=8)
def _cell_matrix(n_anchors: int, n_front_cells: int, n_cells: int) -> np.ndarray:
    """Static (A, cells) anchor→pose-cell one-hot (blazeFaceDetectorH5.py:
    342-353) — pose-per-anchor is then one GEMM.  Derived from the
    single-source walk (ops.detection.anchor_cells) so the grid layout
    cannot desynchronize between backends."""
    front_w = int(round(np.sqrt(n_front_cells)))           # 16 for 16x16
    back_w = int(round(np.sqrt(n_cells - n_front_cells)))  # 8 for 8x8
    # this host-side constant is built DURING jit tracing of the wrapper:
    # without ensure_compile_time_eval the jnp ops inside anchor_cells
    # would be captured into the trace and np.asarray would crash on
    # tracers
    with jax.ensure_compile_time_eval():
        is_front, rf, cf, rb, cb = (np.asarray(v) for v in
                                    anchor_cells(np.arange(n_anchors)))
    cells = np.where(is_front, rf * front_w + cf,
                     n_front_cells + rb * back_w + cb)
    m = np.zeros((n_anchors, n_cells), np.float32)
    m[np.arange(n_anchors), cells] = 1.0
    return m


_HIGHEST = jax.lax.Precision.HIGHEST


def postprocess_pallas(scores_logits, loc, pose_front, pose_back, anchors, *,
                       score_threshold: float = 0.4,
                       iou_threshold: float = 0.3,
                       input_size: int = 128, max_faces: int = MAX_FACES,
                       interpret: bool = False):
    """Batched drop-in for vmap(ops.detection.postprocess): inputs
    (B, A) logits, (B, A, 16) loc, (B, 16, 16, 3)/(B, 8, 8, 3) pose maps →
    dict of (B, F, ...) slabs.  B is padded to a multiple of 128 lanes."""
    b, a = scores_logits.shape
    # shared with the XLA backend (bit-exactness contract): one conversion,
    # one non-finite clamp — see their docstrings in ops.detection
    scores_logits, loc = sanitize_model_outputs(scores_logits, loc)
    logit_thr = score_threshold_to_logit(score_threshold)

    # --------------------------- XLA prep: GEMMs + lane-major relayouts ----
    decoded = jnp.dot(loc, _decode_matrix(input_size),
                      precision=_HIGHEST) + _decode_bias(anchors)  # (B, A, 16)
    pose_table = jnp.concatenate(
        [pose_front.reshape(b, -1, 3), pose_back.reshape(b, -1, 3)],
        axis=1)                                                    # (B, cells, 3)
    n_front = pose_front.shape[1] * pose_front.shape[2]
    cell_m = jnp.asarray(_cell_matrix(a, n_front, pose_table.shape[1]))
    pose_anchor = jnp.einsum("ac,bcd->bad", cell_m, pose_table,
                             precision=_HIGHEST)                   # (B, A, 3)

    pad = (-b) % LANES
    g = (b + pad) // LANES

    sc = jnp.pad(scores_logits, ((0, pad), (0, 0)), constant_values=-np.inf)
    logits_l = sc.reshape(g, LANES, a).transpose(0, 2, 1)          # (G, A, L)

    def lanes(x, ch):
        # (B, A, ch) -> (G, ch, A, LANES): batch into lanes, grid over chunks
        x = jnp.pad(x, ((0, pad), (0, 0), (0, 0)))
        return x.reshape(g, LANES, a, ch).transpose(0, 3, 2, 1)

    dec_l = lanes(decoded, 16)                                     # (G,16,A,L)
    pose_l = lanes(pose_anchor, 3)                                 # (G,3,A,L)

    kernel = functools.partial(_nms_kernel, a, max_faces,
                               float(iou_threshold), logit_thr)
    f8 = -(-max_faces // 8) * 8
    out = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, a, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, a, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, a, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f8, _CH, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, f8, _CH, LANES), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(logits_l, dec_l, pose_l)

    # --------------------------- XLA unpack back to (B, F, ...) -----------
    out = out.transpose(0, 3, 1, 2).reshape(g * LANES, f8, _CH)[:b, :max_faces]
    dec = out[..., _C_DEC:_C_DEC + 16]
    valid = out[..., _C_VALID] > 0.5
    return {
        "boxes": dec[..., :4],
        "keypoints": dec[..., 4:16].reshape(b, max_faces, KEYPOINTS, 2),
        "scores": jax.nn.sigmoid(out[..., _C_LOGIT]) * valid.astype(jnp.float32),
        "poses": out[..., _C_POSE:_C_POSE + 3],
        "valid": valid,
    }
