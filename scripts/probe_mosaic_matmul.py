"""Measure Mosaic (Pallas) matmul throughput on this chip — properly.

docs/BENCH.md cites "~10 TFLOP/s measured on a monolithic 2048^3 bf16 dot"
as the reason the fused Pallas backbone cannot beat XLA.  That number came
from an ad-hoc r2 probe; a single monolithic dot is NOT the canonical Mosaic
matmul (no grid pipeline, one giant VMEM-busting block).  This script
measures the textbook tiled-accumulator kernel — grid (M/bm, N/bn, K/bk),
f32 VMEM accumulator, K innermost with dimension_semantics
('parallel', 'parallel', 'arbitrary') so Mosaic pipelines the block DMAs —
across block shapes, against XLA's jnp.dot on the same operands.

If a tuned kernel lands near XLA, the fused-backbone bet (ops/pallas/
backbone2.py, currently 15.4 vs 10.5 ms/512) reopens; if it confirms ~10
TF/s, the BENCH.md claim gets a reproducible-by-command citation.

Timing: chained-dependency fori_loop inside one jit (CLAUDE.md benchmarking
gotcha — bare repeated dispatches with unchanged inputs can be elided by
this container's runtime).

Usage:
  python scripts/probe_mosaic_matmul.py            # all variants, on-chip
  python scripts/probe_mosaic_matmul.py interpret  # CPU plumbing check
Writes docs/mosaic_matmul_probe.json (on-chip runs only).
"""
from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "mosaic_matmul_probe.json")

M = N = K = 2048
ITERS = 30


def set_size(n, iters):
    global M, N, K, ITERS
    M = N = K = n
    ITERS = iters


def make_pallas_matmul(bm, bn, bk, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                              preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:]

    return pl.pallas_call(
        kernel,
        grid=(M // bm, N // bn, K // bk),
        in_specs=[pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                  pl.BlockSpec((bk, bn), lambda i, j, k: (k, j))],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )


def timed_tflops(mm, a, b):
    """Chained-dependency sustained timing of out = mm(a, b)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(a, b):
        def body(_, a):
            out = mm(a, b)
            # data-dependence back into the next iteration's operand; the
            # scale keeps the perturbation below bf16 resolution
            return (a.astype(jnp.float32)
                    + out * 1e-30).astype(a.dtype)
        return jax.lax.fori_loop(0, ITERS, body, a)

    jax.block_until_ready(chained(a, b))        # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(chained(a, b))
    sec = (time.perf_counter() - t0) / ITERS
    return 2 * M * N * K / sec / 1e12, sec * 1e3


def main():
    interpret = len(sys.argv) > 1 and sys.argv[1] == "interpret"
    import jax
    import jax.numpy as jnp

    if interpret:
        jax.config.update("jax_platforms", "cpu")
        set_size(512, 2)
    elif len(sys.argv) > 1:
        # e.g. `python scripts/probe_mosaic_matmul.py 4096` — bigger sizes
        # amortize per-call overhead and expose the true MXU ceiling.
        # Iterations scale inversely with the n^3 work; sizes must divide
        # the largest block dims or the grid would silently truncate.
        n = int(sys.argv[1])
        if n % 2048:
            raise SystemExit(f"size {n} must be a multiple of 2048 "
                             "(the largest probe block dims)")
        set_size(n, max(4, 30 * 2048 ** 3 // n ** 3))

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    want = np.asarray(jax.jit(lambda a, b: jnp.dot(
        a, b, preferred_element_type=jnp.float32))(a, b))

    report = {"shape": [M, N, K], "dtype": "bf16 in, f32 out",
              "iters": ITERS, "variants": {}}

    tf, ms = timed_tflops(
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32), a, b)
    report["variants"]["xla_dot"] = {"tflops": round(tf, 2),
                                     "ms_per_call": round(ms, 3)}
    print(f"xla_dot: {tf:.1f} TF/s ({ms:.3f} ms)", flush=True)

    for bm, bn, bk in ((512, 512, 512), (512, 1024, 512), (256, 1024, 512),
                       (1024, 1024, 512), (512, 512, 2048)):
        if interpret and (bm > M or bn > N or bk > K):
            continue
        name = f"pallas_{bm}x{bn}x{bk}"
        try:
            mm = make_pallas_matmul(bm, bn, bk, interpret)
            t0 = time.time()
            got = np.asarray(jax.block_until_ready(jax.jit(mm)(a, b)))
            compile_s = time.time() - t0
            err = float(np.abs(got - want).max() /
                        max(1e-9, float(np.abs(want).max())))
            tf, ms = timed_tflops(jax.jit(mm), a, b)
            report["variants"][name] = {
                "tflops": round(tf, 2), "ms_per_call": round(ms, 3),
                "rel_err_vs_xla": err, "compile_s": round(compile_s, 1)}
            print(f"{name}: {tf:.1f} TF/s ({ms:.3f} ms), relerr {err:.1e}, "
                  f"compile {compile_s:.0f} s", flush=True)
        except Exception as e:  # Mosaic block-shape rejection — record it
            msg = str(e).splitlines()[0][:200]
            report["variants"][name] = {"error": msg}
            print(f"{name}: FAILED — {msg}", flush=True)

    if not interpret:
        doc = json.load(open(OUT)) if os.path.exists(OUT) else {}
        doc[f"{M}x{N}x{K}"] = report
        with open(OUT, "w") as f:
            json.dump(doc, f, indent=1)
        print("wrote", OUT)


if __name__ == "__main__":
    main()
