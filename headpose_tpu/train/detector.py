"""Detector training by distillation: teach one BlazeFace topology from another.

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

__all__ = ["DetectorDistillConfig", "distill_targets", "distill_detector"]

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


def _squash(x: jax.Array, s: float) -> jax.Array:
    return s * jnp.tanh(x / s)


def distill_targets(teacher_spec: BlazeFace, teacher_params: Params,
                    images_u8: jax.Array, *, chunk: int = 128,
                    channel_order: str = "bgr") -> dict[str, jax.Array]:
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


def _distill_loss(student_spec: BlazeFace, params: Params, imgs_u8, tgt,
                  norms, loc_scale: float, cfg: DetectorDistillConfig,
                  channel_order: str):
    with jax.default_matmul_precision(cfg.precision):
        x = preprocess(imgs_u8, student_spec.input_size, channel_order)
        out = student_spec.apply(params, x)
    s = cfg.logit_squash
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

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    params = init_params if init_params is not None else student_spec.init(init_key)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, max(cfg.warmup_steps, 1),
        max(cfg.steps, cfg.warmup_steps + 1))
    opt = optax.adam(sched)
    opt_state = opt.init(params)
    n = images_u8.shape[0]

    def step(carry, step_key):
        params, opt_state = carry
        idx = jax.random.randint(step_key, (cfg.batch_size,), 0, n)
        batch_tgt = jax.tree.map(lambda a: a[idx],
                                 {k: v for k, v in tgt.items()})
        grads, metrics = jax.grad(
            lambda p: _distill_loss(student_spec, p, images_u8[idx],
                                    batch_tgt, norms, loc_scale, cfg,
                                    channel_order), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), metrics

    @functools.partial(jax.jit, static_argnums=3)
    def run_block(params, opt_state, block_key, length):
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
        params, opt_state, metrics = run_block(params, opt_state, block_key,
                                               length)
        metrics = jax.tree.map(np.asarray, metrics)
        for k, v in metrics.items():
            history.setdefault(k, []).append(v)
        done += length
        if on_sync is not None:
            on_sync(done, {k: float(v[-1]) for k, v in metrics.items()})
    return params, {k: np.concatenate(v) for k, v in history.items()}
