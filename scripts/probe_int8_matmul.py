"""Measure int8 MXU GEMM throughput on this chip vs bf16.

Why: the v5e datasheet rates int8 at 2x the bf16 MXU peak.  If XLA's
dot_general actually reaches that here, a quantized serving mode
('max-int8': per-channel weight scales, dynamic activation scales) could
sit beyond 'max' (all-bf16, 175k f/s) on the accuracy/throughput curve.
If it doesn't — or only at sizes far above this model's 24-96-channel
convs — the mode isn't worth building, and this probe is the documented
reason (the same role docs/mosaic_matmul_probe.json plays for the fused
backbone).

Measures jnp.dot/lax.dot_general with int8 operands and int32
preferred_element_type at square sizes 2048/4096/8192, against bf16
(DEFAULT precision) on the same shapes.  Timing: chained-dependency
fori_loop inside one jit (CLAUDE.md benchmarking gotcha — bare repeated
same-input dispatches can be elided by this container's runtime); the
chain keeps operands int8 by reinjecting a data-dependent low bit.

Usage:  python scripts/probe_int8_matmul.py [sizes...]
Writes docs/int8_matmul_probe.json (on-chip runs only).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "int8_matmul_probe.json")

ITERS = 30


def timed_tflops(n: int, dtype: str) -> tuple[float, float]:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype == "int8":
        a = jnp.asarray(rng.integers(-127, 128, (n, n), np.int64), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (n, n), np.int64), jnp.int8)

        def mm(a):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)

        def reinject(a, out):
            # fold a data-dependent bit of EVERY output element back into
            # the operand: consuming only a slice of `out` lets XLA
            # dead-code-eliminate the GEMM down to the consumed elements
            # (first version measured an impossible 1284 TOPS this way);
            # int8 wraparound is fine for timing
            return (a + (out & 1).astype(jnp.int8)).astype(jnp.int8)
    else:
        a = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(n, n)), jnp.bfloat16)

        def mm(a):
            return jnp.dot(a, b)

        def reinject(a, out):
            # full-matrix dependence (see int8 note); scale keeps the
            # perturbation below bf16 resolution, as in probe_mosaic_matmul
            return (a.astype(jnp.float32)
                    + out.astype(jnp.float32) * 1e-30).astype(jnp.bfloat16)

    @jax.jit
    def chained(a):
        def body(_, a):
            return reinject(a, mm(a))
        return jax.lax.fori_loop(0, ITERS, body, a)

    jax.block_until_ready(chained(a))           # compile + warm
    t0 = time.perf_counter()
    jax.block_until_ready(chained(a))
    sec = (time.perf_counter() - t0) / ITERS
    return 2 * n ** 3 / sec / 1e12, sec * 1e3


def main():
    import jax

    sizes = [int(s) for s in sys.argv[1:]] or [2048, 4096, 8192]
    on_tpu = jax.default_backend() == "tpu"
    report = {"iters": ITERS, "backend": jax.default_backend(),
              "methodology": "chained-dependency fori_loop, one jit",
              "sizes": {}}
    for n in sizes:
        row = {}
        for dtype in ("bf16", "int8"):
            try:
                tf, ms = timed_tflops(n, dtype)
                row[dtype] = {"tops" if dtype == "int8" else "tflops":
                              round(tf, 1), "ms": round(ms, 3)}
            except Exception as e:  # unsupported lowering is a RESULT here
                row[dtype] = {"error": f"{type(e).__name__}: "
                              f"{str(e).splitlines()[0][:200]}"}
        if "error" not in row["int8"] and "error" not in row["bf16"]:
            row["int8_speedup"] = round(
                row["bf16"]["ms"] / row["int8"]["ms"], 2)
        report["sizes"][str(n)] = row
        print(f"{n}^3: {json.dumps(row)}", flush=True)
    if on_tpu:
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {OUT}")
    else:
        print("not on TPU — results not written")


if __name__ == "__main__":
    main()
