"""Detector training: supervised SSD losses and teacher distillation.

Two ways to train a BlazeFace topology, neither of which the reference has
(its detector arrives as external weights, JoinModels.py:114):

1. SUPERVISED (`fit_detector`): ground-truth boxes → per-anchor targets by
   scale-split cell assignment (`ssd_targets`), sigmoid-focal classification
   + Huber localisation (`ssd_loss`).
2. DISTILLATION (`distill_detector`): a trained detector supervises another
   topology — the production route for the back camera
   (scripts/distill_back.py), detailed below.

Distillation: teach one BlazeFace topology from another.

The reference never trains its detector — BlazeFace arrives as external
weights (JoinModels.py:114) and the back-camera input size is reserved but
never wired (INPUT_BACK=256, blazeFaceDetectorH5.py:8-11).  This module makes
detector topologies trainable inside the framework: a trained detector (the
shipped front model) supervises a student topology at a different input
resolution through four aligned signals:

  * feat88 / feat96 — the two pose-tap feature maps.  The front and back
    topologies land their taps on identical grids (16x16 and 8x8), so the
    maps are directly comparable — and matching them makes the student a
    drop-in backbone for EVERY Model-88/96 pose head (the teacher's own
    heads graft unchanged, models/unified.join_models).
  * scores — per-anchor logits.  The front (strides 8,16 of 128) and back
    (strides 16,32 of 256) anchor tables are IDENTICAL in normalized
    coordinates (same grid shapes + fixed_anchor_size → models/anchors.py;
    asserted in tests/test_detector_train.py), so logits transfer
    anchor-for-anchor.
  * loc — raw SSD offsets are in input-PIXEL units (decode divides by
    input_size, ops/detection.py:36-51), so the student's regression target
    is the teacher's loc scaled by student_size / teacher_size.

Both models see the SAME underlying image: the student consumes the
teacher-resolution frame through the production preprocessing path
(ops.image.preprocess bicubic upsample to its own input size) — exactly what
FaceDetector(input_size=student) does at serving time, so training and
serving distributions match by construction.

TPU-first shape: targets are computed once on device (one chunked teacher
forward), then the whole optimization runs as jitted `lax.scan` blocks of
`steps_per_sync` update steps per dispatch — the host syncs once per block
(this container's tunnel costs ~0.2 s per dispatch; docs/BENCH.md).  All
loss terms are normalized by global teacher second moments so the weights
are scale-free across topologies.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.blazeface import BlazeFace
from ..ops.image import preprocess

__all__ = ["DetectorDistillConfig", "distill_targets", "distill_detector",
           "DetectorFitConfig", "ssd_grids", "ssd_targets", "ssd_loss",
           "fit_detector", "warmstart_params", "distill_prefix"]

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class DetectorDistillConfig:
    """Distillation recipe (defaults tuned for front→back on synthetic data,
    scripts/distill_back.py)."""

    steps: int = 6000
    batch_size: int = 64
    learning_rate: float = 1e-3
    warmup_steps: int = 200          # linear warmup, then cosine to 0
    feat_weight: float = 1.0         # per feature map
    score_weight: float = 1.0
    loc_weight: float = 1.0
    steps_per_sync: int = 250        # scan length per device dispatch
    seed: int = 0
    precision: str = "highest"       # ambient matmul precision of the student
    # logits are compared through a smooth bounded squash so saturated
    # background anchors (teacher logit ~ -20) cannot dominate the MSE while
    # the decision region (|logit| < ~8, sigmoid still moving) stays faithful
    logit_squash: float = 8.0
    clip_norm: float = 1.0           # global-norm gradient clip (0 disables);
    # the synthetic-corpus loss spikes without it (docs/distill_back_result)
    # > 0: weight the feature-map MSE per CELL by (this + teacher face
    # probability at the cell) — the pose heads only ever read features at
    # detected-face cells, so background cells shouldn't spend the student's
    # capacity; the value is the background floor (0 = uniform weighting)
    feat_cell_eps: float = 0.0


def _squash(x: jax.Array, s: float) -> jax.Array:
    return s * jnp.tanh(x / s)


def distill_targets(teacher_spec: BlazeFace, teacher_params: Params,
                    images_u8: jax.Array, *, chunk: int = 128,
                    channel_order: str = "bgr",
                    ) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """One exact (HIGHEST) teacher forward over the training images →
    target pytree {feat88, feat96, scores, loc} plus the global second
    moments the loss normalizes by.  Chunked so the activation footprint
    stays bounded; everything stays on device."""
    n = images_u8.shape[0]

    @jax.jit
    def fwd(imgs):
        with jax.default_matmul_precision("highest"):
            x = preprocess(imgs, teacher_spec.input_size, channel_order)
            out = teacher_spec.apply(teacher_params, x)
        return {k: out[k] for k in ("feat88", "feat96", "scores", "loc")}

    chunks = [fwd(images_u8[i:i + chunk]) for i in range(0, n, chunk)]
    tgt = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *chunks)

    probs = jax.nn.sigmoid(tgt["scores"])                      # (N, A)
    norms = {
        "feat88": jnp.mean(tgt["feat88"] ** 2) + 1e-6,
        "feat96": jnp.mean(tgt["feat96"] ** 2) + 1e-6,
        # loc is supervised only where the teacher sees a face (background
        # offsets are meaningless); normalize by the same weighting
        "loc": (jnp.sum(probs[..., None] * tgt["loc"] ** 2)
                / (jnp.sum(probs) * tgt["loc"].shape[-1] + 1e-6) + 1e-6),
    }
    tgt["loc_prob"] = probs
    return tgt, norms


def warmstart_params(student_spec: BlazeFace, teacher_spec: BlazeFace,
                     teacher_params: Params, key=None) -> Params:
    """Student init from teacher weights wherever block shapes align.

    The front→back relationship (models/blazeface.py BLAZEFACE_BACK) is
    "same stem + same block ladder with extra leading blocks and shifted
    downsample positions" — after the extra stages both nets walk identical
    (resolution, channel) rungs, and a BlazeBlock's weight shapes don't
    depend on its stride.  So blocks are aligned from the END (the shared
    suffix), each unmatched leading student block borrows the first
    teacher block with identical weight shapes, and stem + SSD heads copy
    directly.  Blocks with no shape-compatible teacher analog keep their
    random init (`key`).  Distillation from this start polishes an
    almost-right function instead of rediscovering it (scripts/
    distill_back.py measured the from-scratch route plateauing at ~0.54
    held-out feature rmse; docs/distill_back_result.json)."""
    init = student_spec.init(key if key is not None else jax.random.PRNGKey(0))

    def shapes(b):
        return {k: tuple(v.shape) for k, v in b.items()}

    t_blocks = teacher_params["blocks"]
    out = dict(init)
    for name in ("stem", "cls_front", "cls_back", "loc_front", "loc_back"):
        if shapes(teacher_params[name]) == shapes(init[name]):
            out[name] = jax.tree.map(jnp.asarray, teacher_params[name])
    offset = len(student_spec.block_channels) - len(teacher_spec.block_channels)
    blocks = []
    for k, blk in enumerate(init["blocks"]):
        j = k - offset
        src = None
        if 0 <= j < len(t_blocks) and shapes(t_blocks[j]) == shapes(blk):
            src = t_blocks[j]
        else:
            src = next((tb for tb in t_blocks
                        if shapes(tb) == shapes(blk)), None)
        blocks.append(jax.tree.map(jnp.asarray, src) if src is not None
                      else blk)
    out["blocks"] = blocks
    return out


def _distill_loss(student_spec: BlazeFace, params: Params, imgs_u8, tgt,
                  norms, loc_scale: float, cfg: DetectorDistillConfig,
                  channel_order: str):
    with jax.default_matmul_precision(cfg.precision):
        x = preprocess(imgs_u8, student_spec.input_size, channel_order)
        out = student_spec.apply(params, x)
    s = cfg.logit_squash
    if "w88" in tgt:  # per-cell face-probability weighting (feat_cell_eps)
        def wmse(k, wk):
            w = tgt[wk]
            return (jnp.sum(w * (out[k] - tgt[k]) ** 2)
                    / (jnp.sum(w) * tgt[k].shape[-1] + 1e-6)) / norms[k]

        feat = wmse("feat88", "w88") + wmse("feat96", "w96")
    else:
        feat = (jnp.mean((out["feat88"] - tgt["feat88"]) ** 2) / norms["feat88"]
                + jnp.mean((out["feat96"] - tgt["feat96"]) ** 2) / norms["feat96"])
    score = jnp.mean((_squash(out["scores"], s)
                      - _squash(tgt["scores"], s)) ** 2) / (s * s * 0.25)
    w = tgt["loc_prob"][..., None]
    loc = (jnp.sum(w * (out["loc"] - loc_scale * tgt["loc"]) ** 2)
           / (jnp.sum(w) * tgt["loc"].shape[-1] + 1e-6)
           / (loc_scale ** 2 * norms["loc"]))
    total = (cfg.feat_weight * feat + cfg.score_weight * score
             + cfg.loc_weight * loc)
    return total, {"loss": total, "feat": feat, "score": score, "loc": loc}


def distill_detector(student_spec: BlazeFace, teacher_spec: BlazeFace,
                     teacher_params: Params, images_u8,
                     cfg: DetectorDistillConfig = DetectorDistillConfig(),
                     *, channel_order: str = "bgr",
                     init_params: Params | None = None,
                     on_sync: Callable[[int, dict], None] | None = None,
                     ) -> tuple[Params, dict[str, np.ndarray]]:
    """Train `student_spec` from scratch to reproduce the teacher on
    `images_u8` (N, H, W, 3 uint8, teacher-resolution frames).

    Returns (params, history) where history holds per-step loss terms.
    `on_sync(step, metrics)` fires once per scanned block (progress logging
    without adding host round trips)."""
    import functools

    import optax

    loc_scale = student_spec.input_size / teacher_spec.input_size

    images_u8 = jnp.asarray(images_u8)
    tgt, norms = distill_targets(teacher_spec, teacher_params, images_u8,
                                 channel_order=channel_order)
    if cfg.feat_cell_eps > 0:
        # per-cell weights for the feature losses: (eps + the teacher's max
        # face probability over the cell's anchors), one map per tap grid;
        # normalizers recomputed under the same weighting so the loss scale
        # stays comparable to the uniform mode
        g1, g2, pc1, pc2 = ssd_grids(teacher_spec)
        p = tgt["loc_prob"]
        n_front = g1 * g1 * pc1
        tgt["w88"] = cfg.feat_cell_eps + p[:, :n_front].reshape(
            -1, g1, g1, pc1).max(-1)[..., None]
        tgt["w96"] = cfg.feat_cell_eps + p[:, n_front:].reshape(
            -1, g2, g2, pc2).max(-1)[..., None]
        for k, wk in (("feat88", "w88"), ("feat96", "w96")):
            norms[k] = (jnp.sum(tgt[wk] * tgt[k] ** 2)
                        / (jnp.sum(tgt[wk]) * tgt[k].shape[-1] + 1e-6) + 1e-6)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else student_spec.init(init_key)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, max(cfg.warmup_steps, 1),
        max(cfg.steps, cfg.warmup_steps + 1))
    opt = (optax.chain(optax.clip_by_global_norm(cfg.clip_norm),
                       optax.adam(sched))
           if cfg.clip_norm > 0 else optax.adam(sched))
    opt_state = opt.init(params)
    n = images_u8.shape[0]

    # The training set and target pytree are LARGE (hundreds of MB for a
    # real run) — they must enter the jitted block as ARGUMENTS, never as
    # closed-over constants: captured arrays are embedded in the serialized
    # HLO, which this container's remote-compile tunnel rejects outright
    # (HTTP 413 body-length limit) and which any backend would recompile
    # per dataset.
    @functools.partial(jax.jit, static_argnums=0)
    def run_block(length, params, opt_state, block_key, imgs, tgt, norms):
        def step(carry, step_key):
            params, opt_state = carry
            idx = jax.random.randint(step_key, (cfg.batch_size,), 0, n)
            batch_tgt = jax.tree.map(lambda a: a[idx], tgt)
            grads, metrics = jax.grad(
                lambda p: _distill_loss(student_spec, p, imgs[idx],
                                        batch_tgt, norms, loc_scale, cfg,
                                        channel_order), has_aux=True)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        keys = jax.random.split(block_key, length)
        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    history: dict[str, list] = {}
    done = 0
    n_blocks = math.ceil(cfg.steps / cfg.steps_per_sync)
    for b in range(n_blocks):
        length = min(cfg.steps_per_sync, cfg.steps - done)
        key, block_key = jax.random.split(key)
        params, opt_state, metrics = run_block(length, params, opt_state,
                                               block_key, images_u8, tgt,
                                               norms)
        metrics = jax.tree.map(np.asarray, metrics)
        for k, v in metrics.items():
            history.setdefault(k, []).append(v)
        done += length
        if on_sync is not None:
            on_sync(done, {k: float(v[-1]) for k, v in metrics.items()})
    return params, {k: np.concatenate(v) for k, v in history.items()}


def distill_prefix(student_spec: BlazeFace, student_tap: int,
                   teacher_spec: BlazeFace, teacher_tap: int,
                   teacher_params: Params, images_u8,
                   cfg: DetectorDistillConfig = DetectorDistillConfig(),
                   *, trainable_blocks: tuple[int, ...] = (0,),
                   train_stem: bool = True, channel_order: str = "bgr",
                   init_params: Params | None = None,
                   on_sync: Callable[[int, dict], None] | None = None,
                   ) -> tuple[Params, dict[str, np.ndarray]]:
    """Stage-wise distillation: train only a leading slice of the student
    (stem + `trainable_blocks`) so its `student_tap` activation map
    reproduces the teacher's `teacher_tap` map (tap index -1 = stem output;
    BlazeFace.apply tap_blocks).

    The front→back warm start (warmstart_params) makes the student's
    SUFFIX the teacher's own weights walking identical (resolution,
    channel) rungs — the only genuinely new function is the leading slice
    that absorbs the extra input resolution.  Aligning that slice on its
    local target first turns whole-network distillation into polish
    (scripts/distill_back.py).  Loss = MSE normalized by the teacher map's
    second moment; everything outside the slice is frozen by an optimizer
    mask, and XLA dead-code-eliminates the untapped suffix from the step."""
    import functools

    import optax

    images_u8 = jnp.asarray(images_u8)
    n = images_u8.shape[0]
    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = (init_params if init_params is not None
              else student_spec.init(init_key))

    labels = jax.tree.map(lambda _: "freeze", params)
    labels["stem"] = jax.tree.map(lambda _: "train" if train_stem
                                  else "freeze", labels["stem"])
    for i in trainable_blocks:
        labels["blocks"][i] = jax.tree.map(lambda _: "train",
                                           labels["blocks"][i])

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, max(cfg.warmup_steps, 1),
        max(cfg.steps, cfg.warmup_steps + 1))
    inner = (optax.chain(optax.clip_by_global_norm(cfg.clip_norm),
                         optax.adam(sched))
             if cfg.clip_norm > 0 else optax.adam(sched))
    # multi_transform with set_to_zero, NOT optax.masked: masked passes
    # unmasked leaves' updates through UNCHANGED (raw-gradient ascent on
    # the "frozen" params), it does not zero them
    opt = optax.multi_transform({"train": inner,
                                 "freeze": optax.set_to_zero()}, labels)
    opt_state = opt.init(params)

    t_key = f"block{teacher_tap}_out"
    s_key = f"block{student_tap}_out"

    def loss_fn(p, t_params, imgs):
        with jax.default_matmul_precision(cfg.precision):
            tgt = jax.lax.stop_gradient(teacher_spec.apply(
                t_params, preprocess(imgs, teacher_spec.input_size,
                                     channel_order),
                tap_blocks=(teacher_tap,))[t_key])
            out = student_spec.apply(
                p, preprocess(imgs, student_spec.input_size, channel_order),
                tap_blocks=(student_tap,))[s_key]
        loss = jnp.mean((out - tgt) ** 2) / (jnp.mean(tgt ** 2) + 1e-6)
        return loss, {"loss": loss}

    # data enters as jit arguments, not closures (tunnel HTTP 413 —
    # see distill_detector)
    @functools.partial(jax.jit, static_argnums=0)
    def run_block(length, params, opt_state, block_key, imgs, t_params):
        def step(carry, step_key):
            params, opt_state = carry
            idx = jax.random.randint(step_key, (cfg.batch_size,), 0, n)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(
                params, t_params, imgs[idx])
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        keys = jax.random.split(block_key, length)
        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    history: dict[str, list] = {}
    done = 0
    for _ in range(math.ceil(cfg.steps / cfg.steps_per_sync)):
        length = min(cfg.steps_per_sync, cfg.steps - done)
        key, block_key = jax.random.split(key)
        params, opt_state, metrics = run_block(length, params, opt_state,
                                               block_key, images_u8,
                                               teacher_params)
        metrics = jax.tree.map(np.asarray, metrics)
        for k, v in metrics.items():
            history.setdefault(k, []).append(v)
        done += length
        if on_sync is not None:
            on_sync(done, {k: float(v[-1]) for k, v in metrics.items()})
    return params, {k: np.concatenate(v) for k, v in history.items()}


# --------------------------------------------------------------- supervised

@dataclasses.dataclass(frozen=True)
class DetectorFitConfig:
    """Supervised SSD training recipe (fit_detector)."""

    steps: int = 2000
    batch_size: int = 64
    learning_rate: float = 1e-3
    warmup_steps: int = 100
    steps_per_sync: int = 250
    seed: int = 0
    precision: str = "highest"
    # anchor assignment: GT faces smaller than this (normalized max extent)
    # go to the fine front grid, larger ones to the coarse back grid —
    # mirroring how the shipped model uses its two SSD scales
    scale_split: float = 0.35
    focal_alpha: float = 0.75
    focal_gamma: float = 2.0
    loc_weight: float = 5.0
    huber_delta: float = 0.1     # in normalized (input-relative) units


def ssd_grids(spec: BlazeFace) -> tuple[int, int, int, int]:
    """(front_grid, back_grid, anchors_per_front_cell, anchors_per_back_cell)
    for a BlazeFace spec — the SSD geometry its forward flattens scores/loc
    by (models/blazeface.py apply; 16, 8, 2, 6 for both production specs)."""
    d_before = sum(1 for d in spec.downsample_blocks if d <= spec.tap88_block)
    g1 = spec.input_size // (2 * 2 ** d_before)
    g2 = spec.input_size // (2 * 2 ** len(spec.downsample_blocks))
    return g1, g2, spec.cls_channels[0], spec.cls_channels[1]


def ssd_targets(spec: BlazeFace, boxes: jax.Array, mask: jax.Array,
                keypoints: jax.Array | None = None,
                scale_split: float = 0.35):
    """Ground truth → per-anchor SSD targets, fully vectorized/static-shape.

    boxes: (B, K, 4) normalized corners [x1, y1, x2, y2]; mask: (B, K) 1 for
    real GT rows; keypoints: optional (B, K, 6, 2) normalized.  Each GT is
    assigned to every anchor of the cell containing its center on ONE grid
    chosen by face scale (< scale_split → fine front grid, else coarse back
    grid) — with fixed_anchor_size all anchors of a cell share their center,
    so they share the target too (ops/detection.py decode).  Returns
    (labels (B, A), loc_tgt (B, A, 16)); labels doubles as the positive
    mask for the localisation loss.  Loc targets are in input-PIXEL units
    exactly as the forward's raw loc is decoded (ops/detection.py:36-51).
    Cell collisions keep one GT (scatter order) — matching NMS's
    one-face-per-anchor serving reality."""
    g1, g2, pc1, pc2 = ssd_grids(spec)
    n_front = g1 * g1 * pc1
    n_anchors = n_front + g2 * g2 * pc2
    B, K, _ = boxes.shape
    size = spec.input_size

    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    fine = jnp.maximum(w, h) < scale_split

    def cell_base(g, pc, offset):
        col = jnp.clip((cx * g).astype(jnp.int32), 0, g - 1)
        row = jnp.clip((cy * g).astype(jnp.int32), 0, g - 1)
        base = offset + (row * g + col) * pc
        acx = (col + 0.5) / g
        acy = (row + 0.5) / g
        return base, acx, acy

    base_f, acx_f, acy_f = cell_base(g1, pc1, 0)
    base_b, acx_b, acy_b = cell_base(g2, pc2, n_front)
    base = jnp.where(fine, base_f, base_b)            # (B, K)
    acx = jnp.where(fine, acx_f, acx_b)
    acy = jnp.where(fine, acy_f, acy_b)
    per_cell = jnp.where(fine, pc1, pc2)

    # raw-loc targets in input pixels (the decode inverse)
    tgt = jnp.zeros((B, K, 16))
    tgt = tgt.at[..., 0].set((cx - acx) * size)
    tgt = tgt.at[..., 1].set((cy - acy) * size)
    tgt = tgt.at[..., 2].set(w * size)
    tgt = tgt.at[..., 3].set(h * size)
    if keypoints is not None:
        kp = (keypoints - jnp.stack([acx, acy], -1)[:, :, None, :]) * size
        tgt = tgt.at[..., 4:16].set(kp.reshape(B, K, 12))

    # scatter each GT into all anchors of its cell; invalid rows (mask=0 or
    # beyond per_cell) are routed to index n_anchors which .at[] drops
    max_pc = max(pc1, pc2)
    offs = jnp.arange(max_pc)                         # (max_pc,)
    idx = base[..., None] + offs                      # (B, K, max_pc)
    live = (mask[..., None] > 0) & (offs < per_cell[..., None])
    idx = jnp.where(live, idx, n_anchors)

    labels = jnp.zeros((B, n_anchors + 1))
    labels = labels.at[jnp.arange(B)[:, None, None], idx].set(1.0)
    loc_tgt = jnp.zeros((B, n_anchors + 1, 16))
    loc_tgt = loc_tgt.at[jnp.arange(B)[:, None, None], idx].set(
        jnp.broadcast_to(tgt[:, :, None, :], (B, K, max_pc, 16)))
    return labels[:, :-1], loc_tgt[:, :-1]


def ssd_loss(spec: BlazeFace, out: dict, labels, loc_tgt,
             cfg: DetectorFitConfig, kp_weight: float = 0.0):
    """Sigmoid-focal classification + Huber localisation (normalized units).
    `labels` doubles as the positive mask weighting the localisation term.
    kp_weight > 0 additionally supervises the 12 keypoint offsets."""
    import optax

    logits = out["scores"]
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, labels)
    pt = labels * p + (1 - labels) * (1 - p)
    alpha = labels * cfg.focal_alpha + (1 - labels) * (1 - cfg.focal_alpha)
    focal = jnp.mean(alpha * (1 - pt) ** cfg.focal_gamma * ce) * labels.shape[-1]

    diff = (out["loc"] - loc_tgt) / spec.input_size
    dim_w = jnp.concatenate([jnp.ones(4), jnp.full(12, kp_weight)])
    hub = jnp.where(jnp.abs(diff) <= cfg.huber_delta,
                    0.5 * diff ** 2 / cfg.huber_delta,
                    jnp.abs(diff) - 0.5 * cfg.huber_delta)
    loc = (jnp.sum(labels[..., None] * dim_w * hub)
           / (jnp.sum(labels) * (4 + 12 * (kp_weight > 0)) + 1e-6))
    total = focal + cfg.loc_weight * loc
    return total, {"loss": total, "focal": focal, "loc": loc}


def fit_detector(spec: BlazeFace, images_u8, boxes, mask,
                 cfg: DetectorFitConfig = DetectorFitConfig(),
                 *, keypoints=None, kp_weight: float = 0.0,
                 channel_order: str = "bgr",
                 init_params: Params | None = None,
                 on_sync: Callable[[int, dict], None] | None = None,
                 ) -> tuple[Params, dict[str, np.ndarray]]:
    """Supervised SSD training of a BlazeFace spec from ground-truth boxes
    (images_u8 (N,H,W,3) at the spec's own or any resolution — preprocessed
    through the production path; boxes (N,K,4) normalized corners, mask
    (N,K)).  Same scanned-block device loop as distill_detector."""
    import functools

    import optax

    images_u8 = jnp.asarray(images_u8)
    boxes = jnp.asarray(boxes, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    kps = None if keypoints is None else jnp.asarray(keypoints, jnp.float32)
    labels, loc_tgt = ssd_targets(spec, boxes, mask, kps, cfg.scale_split)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else spec.init(init_key)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, max(cfg.warmup_steps, 1),
        max(cfg.steps, cfg.warmup_steps + 1))
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    n = images_u8.shape[0]

    # data enters as jit arguments, not closures — see distill_detector's
    # run_block comment (tunnel HTTP 413 on embedded-constant HLO)
    @functools.partial(jax.jit, static_argnums=0)
    def run_block(length, params, opt_state, block_key, imgs, labels,
                  loc_tgt):
        def loss_fn(p, idx):
            with jax.default_matmul_precision(cfg.precision):
                x = preprocess(imgs[idx], spec.input_size, channel_order)
                out = spec.apply(p, x)
            return ssd_loss(spec, out, labels[idx], loc_tgt[idx],
                            cfg, kp_weight)

        def step(carry, step_key):
            params, opt_state = carry
            idx = jax.random.randint(step_key, (cfg.batch_size,), 0, n)
            grads, metrics = jax.grad(loss_fn, has_aux=True)(params, idx)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        keys = jax.random.split(block_key, length)
        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    history: dict[str, list] = {}
    done = 0
    for _ in range(math.ceil(cfg.steps / cfg.steps_per_sync)):
        length = min(cfg.steps_per_sync, cfg.steps - done)
        key, block_key = jax.random.split(key)
        params, opt_state, metrics = run_block(length, params, opt_state,
                                               block_key, images_u8, labels,
                                               loc_tgt)
        metrics = jax.tree.map(np.asarray, metrics)
        for k, v in metrics.items():
            history.setdefault(k, []).append(v)
        done += length
        if on_sync is not None:
            on_sync(done, {k: float(v[-1]) for k, v in metrics.items()})
    return params, {k: np.concatenate(v) for k, v in history.items()}
