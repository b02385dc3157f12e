"""Profile the postprocess tax on the real chip: which piece costs what.

Times jitted subprograms with staged inputs at batch 256/512:
  forward-only, postprocess-only, and postprocess pieces (decode, nms,
  gathers).  Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_post.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from headpose_tpu.models.anchors import FRONT_CONFIG, generate_anchors
from headpose_tpu.ops.detection import (MAX_FACES, postprocess, decode_boxes,
                                        _selection_nms, decode_keypoints,
                                        gather_poses)
from headpose_tpu.ops.image import preprocess
from headpose_tpu.pretrained import load_flagship

import numpy as _np


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    model, params = load_flagship()
    anchors = jnp.asarray(generate_anchors(FRONT_CONFIG), jnp.float32)
    rng = np.random.default_rng(0)

    for batch in (256,):
        frames = jax.device_put(rng.integers(0, 256, (batch, 128, 128, 3),
                                             dtype=np.int64).astype(np.uint8))

        @jax.jit
        def forward(params, images):
            with jax.default_matmul_precision("highest"):
                x = preprocess(images, 128, "bgr")
                return model.apply(params, x)

        out = forward(params, frames)
        out = jax.tree.map(jax.device_put, jax.tree.map(np.asarray, out))
        out = {k: jax.device_put(jnp.asarray(v)) for k, v in out.items()}

        @jax.jit
        def post_full(out):
            return jax.vmap(lambda s, l, pf, pb: postprocess(
                s, l, pf, pb, anchors, score_threshold=0.4,
                iou_threshold=0.3, input_size=128))(
                out["scores"], out["loc"], out["pose_front"], out["pose_back"])

        @jax.jit
        def post_decode_only(out):
            return jax.vmap(lambda l: decode_boxes(l, anchors, 128))(out["loc"])

        @jax.jit
        def post_nms_only(out):
            logit_thr = float(np.log(0.4 / 0.6))

            def one(s, l):
                remaining = jnp.where(s > logit_thr, s, -jnp.inf)
                boxes = decode_boxes(l, anchors, 128)
                return _selection_nms(remaining, boxes, MAX_FACES, 0.3)
            return jax.vmap(one)(out["scores"], out["loc"])

        @jax.jit
        def post_gathers(out, sel_idx, count):
            def one(s, l, pf, pb, sel, cnt):
                keep = jnp.arange(MAX_FACES) < cnt
                z = jnp.where(keep, 1.0, 0.0)
                boxes = decode_boxes(l, anchors, 128)
                sel_anchors = anchors[sel]
                sel_loc = l[sel]
                return {
                    "boxes": boxes[sel] * z[:, None],
                    "keypoints": decode_keypoints(sel_loc, sel_anchors, 128)
                                 * z[:, None, None],
                    "scores": jax.nn.sigmoid(s[sel]) * z,
                    "poses": gather_poses(sel, pf, pb) * z[:, None],
                    "valid": keep,
                }
            return jax.vmap(one)(out["scores"], out["loc"], out["pose_front"],
                                 out["pose_back"], sel_idx, count)

        from headpose_tpu.ops.detection import _decode_matrix, _decode_bias, _HIGHEST

        @jax.jit
        def new_decode(out):
            def one(l):
                return jnp.dot(l, _decode_matrix(128), precision=_HIGHEST) \
                    + _decode_bias(anchors)
            return jax.vmap(one)(out["loc"])

        @jax.jit
        def new_decode_nms(out):
            logit_thr = float(np.log(0.4 / 0.6))

            def one(s, l):
                remaining = jnp.where(s > logit_thr, s, -jnp.inf)
                dec = jnp.dot(l, _decode_matrix(128), precision=_HIGHEST) \
                    + _decode_bias(anchors)
                return _selection_nms(remaining, dec[:, :4], MAX_FACES, 0.3)
            return jax.vmap(one)(out["scores"], out["loc"])

        @jax.jit
        def new_onehot_part(out, sel_idx, count):
            def one(s, l, pf, pb, sel, cnt):
                keep = jnp.arange(MAX_FACES) < cnt
                dec = jnp.dot(l, _decode_matrix(128), precision=_HIGHEST) \
                    + _decode_bias(anchors)
                onehot = jnp.where((sel[:, None] == jnp.arange(896)[None, :]) &
                                   keep[:, None], 1.0, 0.0)
                sel_dec = jnp.dot(onehot, dec, precision=_HIGHEST)
                return sel_dec
            return jax.vmap(one)(out["scores"], out["loc"], out["pose_front"],
                                 out["pose_back"], sel_idx, count)

        sel_idx, count = new_decode_nms(out)
        sel_idx = jax.device_put(sel_idx)
        count = jax.device_put(count)

        print(f"batch={batch}")
        print(f"  forward:          {timeit(forward, params, frames):7.3f} ms")
        print(f"  post full (new):  {timeit(post_full, out):7.3f} ms")
        print(f"  new decode:       {timeit(new_decode, out):7.3f} ms")
        print(f"  new decode+nms:   {timeit(new_decode_nms, out):7.3f} ms")
        print(f"  decode+nms+onehot:{timeit(new_onehot_part, out, sel_idx, count):7.3f} ms")


if __name__ == "__main__":
    main()
