"""Probe the >128 batch wall-time cliff (VERDICT r2 item 4).

Round-2 measurement: batches <=128 cost ~1.2-1.3 ms ('turbo', sustained),
160 jumps to 2.69 ms (~2x), and throughput then FALLS with batch (256 ->
84.5k, 512 -> 66.7k) — unexplained.  This probe, all in 'fast' mode
(the round-3 certified headline):

  1. pins the exact cliff edge (127/128/129/132/144/160),
  2. separates backbone vs postprocess (pipeline variant without postprocess),
  3. tests whether two parallel 128-wide branches inside ONE jit overlap
     (the latency-bound tail chains are data-independent, so if the cliff is
     a serial re-dispatch, parallel branches should beat native 256),
  4. re-checks the large-batch decline.

Methodology: bench-style sustained loops (8 staged buffers, one block at the
end) on FULL pipeline variants — never forward-only slices (CLAUDE.md
"Benchmarking gotcha").

Run: python scripts/probe_batch_cliff.py [round]   (rounds keep runs <10 min)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "batch_cliff_probe.json")


def make_pipeline(variant: str):
    """variant: 'full' | 'nopost' | 'split2' | 'split4'."""
    import jax
    import jax.numpy as jnp

    from headpose_tpu.models.anchors import generate_anchors
    from headpose_tpu.ops.detection import postprocess
    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.pretrained import load_flagship

    model, params = load_flagship()
    anchors = jnp.asarray(generate_anchors(), jnp.float32)

    def forward(params, images):
        with jax.default_matmul_precision("high"):
            x = preprocess(images, 128, "bgr")
            out = model.apply(params, x, dense=True)
        if variant == "nopost":
            # keep a small reduction so nothing is dead-code-eliminated
            return {k: v.sum() for k, v in out.items()}
        return jax.vmap(
            lambda s, l, pf, pb: postprocess(s, l, pf, pb, anchors))(
            out["scores"], out["loc"], out["pose_front"], out["pose_back"])

    if variant in ("split2", "split4"):
        k = int(variant[-1])

        def split_forward(params, images):
            # k independent 128-wide branches in ONE jit: the tail chains are
            # data-independent, so XLA may overlap them where a bigger batch
            # serializes
            chunks = jnp.split(images, k, axis=0)
            outs = [forward(params, c) for c in chunks]
            return jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate([x[None] for x in xs]), *outs)

        return split_forward, params
    return forward, params


def timeit(fn, params, batch: int, iters: int = 300) -> float:
    from headpose_tpu.utils.profiling import (staged_uint8_frames,
                                              sustained_seconds_per_dispatch)

    bufs = staged_uint8_frames(batch)
    return sustained_seconds_per_dispatch(lambda b: fn(params, b), bufs,
                                          iters)


def main():
    import jax

    rnd = sys.argv[1] if len(sys.argv) > 1 else "1"
    report = json.load(open(OUT)) if os.path.exists(OUT) else {}

    if rnd == "1":        # cliff edge + nopost separation
        cases = [("full", b) for b in (127, 128, 129, 132, 144, 160)]
    elif rnd == "2":
        cases = [("nopost", b) for b in (128, 160, 256)] + [("full", 256)]
    elif rnd == "3":      # parallel-branch overlap test
        cases = [("split2", 256), ("split4", 512), ("full", 512)]
    else:
        cases = [tuple(x.split(":")) for x in sys.argv[2:]]
        cases = [(v, int(b)) for v, b in cases]

    fns = {}
    for variant, batch in cases:
        if variant not in fns:
            fn, params = make_pipeline(variant)
            fns[variant] = (jax.jit(fn), params)
        fn, params = fns[variant]
        dt = timeit(fn, params, batch)
        fps = batch / dt
        key = f"{variant}_b{batch}"
        report[key] = {"ms": round(dt * 1e3, 3), "fps": round(fps, 0)}
        print(f"{key:>14}: {dt*1e3:7.3f} ms  {fps:10,.0f} frames/sec")
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
