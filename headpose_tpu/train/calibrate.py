"""Precision calibration: distill the exact-f32 pipeline into bf16 islands.

On TPU the MXU's single-pass bf16 mode is ~2x the throughput of the 3-pass
'high' mode, but running the whole backbone that way costs 0.26 deg of pose
error on the golden images (docs/BENCH.md) — over the 0.1 deg parity budget
(BASELINE.md).  The error is dominated by a *systematic* component: each
conv's operands are rounded to bf16 (8-bit mantissa), and those per-weight
rounding residuals propagate deterministically through the un-normalized
conv stack.

This module removes the systematic component by self-distillation: fine-tune
the backbone weights W so that the bf16-island forward with W matches the
exact-f32 forward with the ORIGINAL weights W0 on synthetic calibration
images.  The pose heads stay frozen (gradients flow through them into the
feature maps); targets are the deployed outputs — pose maps, detection
scores (post-sigmoid, so near-threshold cells dominate), and raw loc — so
detection parity is part of the objective, not an afterthought.

The bf16 forward is `simulate_fast=True` (models/blazeface.py): operands
rounded to bf16, f32 accumulation at HIGHEST — verified BIT-EXACT to the
real DEFAULT-precision island on the chip, and differentiable (astype is
straight-through under autodiff, i.e. the rounding is treated as identity
in the backward pass — the standard quantization-aware-training estimator).

No analogue exists in the reference (it serves f32 on CPU); this is the
TPU-native answer to its accuracy contract at bf16 speed.

Measured outcome on the flagship (docs/BENCH.md): calibration moves the
all-blocks-island golden pose error 0.262° → 0.233° (2000 steps, lr 1e-5)
— real but bounded, because the error decomposition (simulate_fast=
'weights'/'acts') shows the ACTIVATION-rounding component alone is 0.249°
for that island: no weight adjustment can reach the 0.1° parity budget
there.  The production 'turbo' island (blocks 10..15) was chosen instead;
this module remains the tool for quantization-aware fine-tunes where a
trained-from-scratch head (not reference parity) is the target.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

__all__ = ["synthesize_images", "calibrate_fast_params", "ALL_BLOCKS"]

Params = dict[str, Any]

ALL_BLOCKS = tuple(range(16))


def synthesize_images(key, n: int, size: int = 128):
    """Random calibration frames in [-1, 1], (n, size, size, 3).

    Each image is a random convex-ish mixture of noise fields at several
    spatial scales (pixel, 4px, 16px, 64px) plus a flat color — a broad
    spectral family that exercises every conv's input range without using
    any evaluation image.  Matching the exact forward on this family
    transfers to natural images because the network is the same function.
    """
    kf, k1, k2, k3, k4, kw = jax.random.split(key, 6)

    def field(k, r):
        v = jax.random.uniform(k, (n, r, r, 3), jnp.float32, -1.0, 1.0)
        if r == size:
            return v
        return jax.image.resize(v, (n, size, size, 3), "bilinear")

    comps = jnp.stack([
        field(k1, size),            # per-pixel noise
        field(k2, max(size // 4, 1)),
        field(k3, max(size // 16, 1)),
        field(k4, max(size // 64, 1)),
        jnp.broadcast_to(jax.random.uniform(kf, (n, 1, 1, 3), jnp.float32,
                                            -1.0, 1.0), (n, size, size, 3)),
    ])                               # (5, n, size, size, 3)
    w = jax.random.dirichlet(kw, jnp.ones((5,)), (n,))       # (n, 5)
    img = jnp.einsum("cnhwk,nc->nhwk", comps, w)
    return jnp.clip(img * 2.0, -1.0, 1.0)  # x2: restore contrast lost mixing


def calibrate_fast_params(model, params: Params, *,
                          steps: int = 2000, batch: int = 64,
                          learning_rate: float = 1e-4,
                          fast_blocks: tuple[int, ...] = ALL_BLOCKS,
                          seed: int = 0,
                          loss_weights: tuple[float, float, float, float]
                          = (1.0, 1.0, 10.0, 0.1)) -> tuple[Params, dict]:
    """Fine-tune backbone params so the bf16-island forward matches the
    exact-f32 forward of the original params.

    model: UnifiedPoseModel (models/unified.py).  Returns (new_params,
    history) where new_params has the calibrated backbone and the original
    (frozen) pose heads, and history carries per-step loss components
    (pose_front, pose_back, sigmoid-scores, loc — weighted by loss_weights).

    Runs as ONE jitted lax.scan: calibration images are synthesized on
    device per step (no host transfers), targets recomputed at HIGHEST from
    the frozen original weights, gradients at HIGHEST through the
    straight-through bf16 rounding.
    """
    params0 = jax.tree_util.tree_map(jnp.asarray, params)
    backbone0 = params0["backbone"]
    size = model.backbone.input_size
    w_pf, w_pb, w_sc, w_loc = loss_weights

    def exact_forward(x):
        with jax.default_matmul_precision("highest"):
            out = model.apply(params0, x)
        return jax.tree_util.tree_map(jax.lax.stop_gradient, out)

    def fast_forward(backbone, x):
        p = dict(params0, backbone=backbone)
        # ambient 'high' matches the deployed serving mode for the
        # non-island stages (stem, pose heads); islands are bf16-simulated.
        with jax.default_matmul_precision("high"):
            return model.apply(p, x, dense=True, fast_blocks=fast_blocks,
                               simulate_fast=True)

    def loss_fn(backbone, x):
        ref = exact_forward(x)
        out = fast_forward(backbone, x)
        terms = {
            "pose_front": w_pf * jnp.mean(
                (out["pose_front"] - ref["pose_front"]) ** 2),
            "pose_back": w_pb * jnp.mean(
                (out["pose_back"] - ref["pose_back"]) ** 2),
            "scores": w_sc * jnp.mean(
                (jax.nn.sigmoid(out["scores"])
                 - jax.nn.sigmoid(ref["scores"])) ** 2),
            "loc": w_loc * jnp.mean((out["loc"] - ref["loc"]) ** 2),
        }
        return sum(terms.values()), terms

    tx = optax.adam(optax.cosine_decay_schedule(learning_rate, steps))
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def run(backbone):
        opt_state = tx.init(backbone)

        def step(carry, i):
            bb, opt = carry
            x = synthesize_images(jax.random.fold_in(key, i), batch, size)
            (loss, terms), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(bb, x)
            updates, opt = tx.update(grads, opt, bb)
            bb = optax.apply_updates(bb, updates)
            return (bb, opt), {"loss": loss, **terms}

        (bb, _), hist = jax.lax.scan(step, (backbone, opt_state),
                                     jnp.arange(steps))
        return bb, hist

    calibrated, hist = run(backbone0)
    new_params = dict(params0, backbone=calibrated)
    history = jax.tree_util.tree_map(
        lambda a: jax.device_get(a), hist)
    return new_params, history
