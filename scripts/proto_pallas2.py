"""Interpret-mode validation + staged TPU compile probes for backbone2.

Usage:
  python scripts/proto_pallas2.py interp            # CPU interpret parity
  python scripts/proto_pallas2.py probe A|B|C|D|all # TPU compile probes
  python scripts/proto_pallas2.py bench             # fused forward timing
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "interp"
    import jax
    if mode == "interp":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.ops.pallas.backbone2 import (
        apply_fused, pack_backbone, run_segment, SEGMENTS,
        _planes_nchw, _gap_nchw, _unflatten_nchw, _rup8,
        _coalesce, _uncoalesce, _geom)
    from headpose_tpu.pretrained import load_flagship

    model, params = load_flagship()
    spec = model.backbone
    bp = params["backbone"]
    packed = pack_backbone(spec, bp)
    rng = np.random.default_rng(0)
    B = 8
    imgs = rng.integers(0, 256, (B, 128, 128, 3), "int64").astype(np.uint8)
    x = preprocess(jnp.asarray(imgs), 128, "bgr")

    with jax.default_matmul_precision("highest"):
        ref = model.backbone.apply(bp, x)
    f88_ref, f96_ref = ref["feat88"], ref["feat96"]

    def xla_stage(upto):
        """Feature map entering block `upto` via the XLA path (NHWC)."""
        def conv(p, v, stride=1, groups=1):
            return jax.lax.conv_general_dilated(
                v, p[0], (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups) + p[1]
        with jax.default_matmul_precision("highest"):
            y = jax.nn.relu(conv((bp["stem"]["kernel"], bp["stem"]["bias"]),
                                 x, stride=2))
            for i in range(upto):
                blk = bp["blocks"][i]
                cin = y.shape[-1]
                stride = 2 if i in spec.downsample_blocks else 1
                t = conv((blk["dw_kernel"], blk["dw_bias"]), y,
                         stride=stride, groups=cin)
                t = conv((blk["pw_kernel"], blk["pw_bias"]), t)
                skip = y
                if stride == 2:
                    skip = jax.lax.reduce_window(
                        skip, -jnp.inf, jax.lax.max,
                        (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
                if spec.block_channels[i] > cin:
                    skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0),
                                          (0, spec.block_channels[i] - cin)))
                y = jax.nn.relu(t + skip)
        return y

    interp = mode == "interp"

    def check_seg(seg):
        first, last, in_h, planes, t = SEGMENTS[seg]
        y_in = xla_stage(first).transpose(0, 3, 1, 2)     # NCHW
        c8 = _rup8(y_in.shape[1])
        buf = _planes_nchw(y_in, c8) if planes else _gap_nchw(y_in, c8)
        out_h = in_h // (2 if last in spec.downsample_blocks else 1)
        buf = _coalesce(buf, t, _geom(in_h // 2 if planes else in_h)[2])
        t0 = time.perf_counter()
        out = run_segment(spec, packed[seg], buf, seg=seg, interpret=interp)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        out = _uncoalesce(out, t, _geom(out_h)[1])
        got = _unflatten_nchw(out, out_h, spec.block_channels[last]
                              ).transpose(0, 2, 3, 1)
        want = xla_stage(last + 1)
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"[{seg}] blocks {first}-{last}: err {err:.2e}  ({dt:.1f}s)")

    if mode == "interp":
        for seg in "ABCD":
            check_seg(seg)
        f88, f96 = apply_fused(spec, bp, packed, x, interpret=True)
        print("fused feat88 err:", float(jnp.max(jnp.abs(f88 - f88_ref))),
              " feat96 err:", float(jnp.max(jnp.abs(f96 - f96_ref))))
    elif mode == "probe":
        segs = sys.argv[2]
        for seg in ("ABCD" if segs == "all" else segs):
            check_seg(seg)
    elif mode == "bench":
        f = jax.jit(lambda xx: apply_fused(spec, bp, packed, xx))
        f88, f96 = f(x)
        print("TPU fused feat88 err:", float(jnp.max(jnp.abs(f88 - f88_ref))),
              " feat96 err:", float(jnp.max(jnp.abs(f96 - f96_ref))))

        def timeit(fn, *a):
            o = fn(*a)
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(50):
                o = fn(*a)
            jax.block_until_ready(o)
            return (time.perf_counter() - t0) / 50 * 1e3

        B2 = 512
        imgs2 = rng.integers(0, 256, (B2, 128, 128, 3), "int64").astype(np.uint8)
        x2 = jax.device_put(np.asarray(
            preprocess(jnp.asarray(imgs2), 128, "bgr")))
        dt = timeit(f, x2)
        print(f"fused backbone @512: {dt:.3f} ms ({512/dt*1000:,.0f} img/s)")

        # per-stage decomposition
        T = SEGMENTS["A"][4]

        @jax.jit
        def stem_fn(xx):
            with jax.default_matmul_precision("highest"):
                y0 = jax.lax.conv_general_dilated(
                    xx, bp["stem"]["kernel"], (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NCHW"))
                y0 = jax.nn.relu(y0 + bp["stem"]["bias"][None, :, None, None])
            return _coalesce(_planes_nchw(y0, 24), T, _geom(32)[2])

        bufA = jax.device_put(np.asarray(stem_fn(x2)))
        segA = jax.jit(lambda v: run_segment(spec, packed["A"], v, seg="A"))
        outA = jax.device_put(np.asarray(segA(bufA)))

        @jax.jit
        def bridge32(v):
            y32 = _unflatten_nchw(_uncoalesce(v, T, _geom(32)[1]), 32, 32)
            return _coalesce(_planes_nchw(y32, 32), T, _geom(16)[2])
        bufB = jax.device_put(np.asarray(bridge32(outA)))
        segB = jax.jit(lambda v: run_segment(spec, packed["B"], v, seg="B"))
        bufC = jax.device_put(np.asarray(segB(bufB)))
        segC = jax.jit(lambda v: run_segment(spec, packed["C"], v, seg="C"))
        print(f"stem+plane64: {timeit(stem_fn, x2):7.3f} ms")
        print(f"segA:         {timeit(segA, bufA):7.3f} ms")
        print(f"bridge32:     {timeit(bridge32, outA):7.3f} ms")
        print(f"segB:         {timeit(segB, bufB):7.3f} ms")
        print(f"segC:         {timeit(segC, bufC):7.3f} ms")


if __name__ == "__main__":
    main()
