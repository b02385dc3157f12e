"""On-chip regression for the fused Pallas backbone segments (backbone2).

Round 2 validated the four segment kernels on the real chip once, by hand;
this script makes that reproducible-by-command (VERDICT r2 item 7): for each
segment A-D it

  * rebuilds the segment input from the XLA backbone boundary activations,
  * runs the compiled (NOT interpret) Pallas kernel on the chip,
  * asserts <= 2.0e-4 against the XLA boundary output (the r2 hand-run
    bound was 1.2e-4 at batch 8; the max over this batch-64 activation set
    runs marginally higher — see TOL below),
  * times it with the chained-dependency methodology (CLAUDE.md
    "Benchmarking gotcha": bare repeated dispatches of identical inputs can
    be elided by this container's runtime; chaining x += sum(f(x))*1e-30
    through a fori_loop inside one jit defeats that),

and appends the result to docs/kernel_regression.json.

Mosaic compiles through the tunnel cost 100-550 s EACH — run one segment per
invocation:   python scripts/kernel_regression.py A     (then B, C, D, P
— the fused postprocess kernel vs the XLA postprocess on real model
outputs, bit-exact gate — and W — the same kernel under WORST-CASE NMS
load: score_threshold 0 keeps all 896 anchors and iou_threshold 0.01
forces every lane through the full max_faces=100 extraction trips)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "kernel_regression.json")

BATCH = 64        # multiple of the coalescing factor t=8
# r2's hand-run validation measured <=1.2e-4 at batch 8; the max over a
# batch-64 activation set runs marginally higher (split-float bf16 tails)
TOL = 2.0e-4


def xla_boundaries(spec, bp, x):
    """Run the XLA backbone block-by-block (HIGHEST) and collect the
    activations at the segment boundaries: after blocks 2, 5, 10, 11, 15."""
    import jax
    import jax.numpy as jnp

    def conv(p, v, stride=1, groups=1):
        return jax.lax.conv_general_dilated(
            v, p[0], (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups) + p[1]

    outs = {}
    with jax.default_matmul_precision("highest"):
        y = jax.nn.relu(conv((bp["stem"]["kernel"], bp["stem"]["bias"]),
                             x, stride=2))
        outs["stem"] = y
        for i, cout in enumerate(spec.block_channels):
            cin = y.shape[-1]
            stride = 2 if i in spec.downsample_blocks else 1
            t = conv((bp["blocks"][i]["dw_kernel"], bp["blocks"][i]["dw_bias"]),
                     y, stride=stride, groups=cin)
            t = conv((bp["blocks"][i]["pw_kernel"], bp["blocks"][i]["pw_bias"]), t)
            skip = y
            if stride == 2:
                skip = jax.lax.reduce_window(skip, -jnp.inf, jax.lax.max,
                                             (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            if cout > cin:
                skip = jnp.pad(skip, ((0, 0),) * 3 + ((0, cout - cin),))
            y = jax.nn.relu(t + skip)
            if i in (2, 5, 10, 11, 15):
                outs[f"b{i}"] = y
    return {k: np.asarray(v) for k, v in outs.items()}


def segment_io(seg, spec, bounds):
    """(kernel input (coalesced), expected NHWC output, output (h, c))."""
    import jax.numpy as jnp

    from headpose_tpu.ops.pallas import backbone2 as bb2

    t = bb2.SEGMENTS[seg][4]

    def nchw(a):
        return jnp.asarray(a).transpose(0, 3, 1, 2)

    if seg == "A":
        src, want, h = bounds["stem"], bounds["b2"], 32
        x = bb2._coalesce(bb2._planes_nchw(nchw(src), bb2._rup8(src.shape[-1])),
                          t, bb2._geom(32)[2])
    elif seg == "B":
        src, want, h = bounds["b2"], bounds["b5"], 16
        x = bb2._coalesce(bb2._planes_nchw(nchw(src), bb2._rup8(src.shape[-1])),
                          t, bb2._geom(16)[2])
    elif seg == "C":
        src, want, h = bounds["b5"], bounds["b10"], 16
        x = bb2._coalesce(bb2._gap_nchw(nchw(src), bb2._rup8(src.shape[-1])),
                          t, bb2._geom(16)[2])
    else:
        src, want, h = bounds["b11"], bounds["b15"], 8
        x = bb2._coalesce(bb2._gap_nchw(nchw(src), bb2._rup8(src.shape[-1])),
                          t, bb2._geom(8)[2])
    return x, want, h


def postprocess_regression(interp: bool):
    """'P': the fused postprocess kernel vs the XLA postprocess on REAL
    model outputs (flagship forward on noise + the golden production image),
    asserting bit-exactness, with chained-dependency timing of the
    kernel-side program."""
    import jax
    import jax.numpy as jnp

    from headpose_tpu.models.anchors import generate_anchors
    from headpose_tpu.ops.detection import postprocess
    from headpose_tpu.ops.image import preprocess
    from headpose_tpu.ops.pallas.postprocess import postprocess_pallas
    from headpose_tpu.pretrained import load_flagship

    model, params = load_flagship()
    anchors = jnp.asarray(generate_anchors(), jnp.float32)
    golden = np.load(os.path.join(REPO, "tests", "golden",
                                  "e2e_production.npz"))
    img = np.asarray(golden["img"], np.uint8)[64:192, 64:192]
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (128, 128, 128, 3)).astype(np.uint8)
    frames[:16] = img[None]

    @jax.jit
    def heads(imgs):
        with jax.default_matmul_precision("highest"):
            x = preprocess(imgs, 128, "bgr")
            return model.apply(params, x)

    out = heads(jnp.asarray(frames))
    args = (out["scores"], out["loc"], out["pose_front"], out["pose_back"])

    want = jax.jit(jax.vmap(
        lambda s, l, pf, pb: postprocess(s, l, pf, pb, anchors)))(*args)
    run = jax.jit(lambda s, l, pf, pb: postprocess_pallas(
        s, l, pf, pb, anchors, interpret=interp))
    t0 = time.time()
    got = jax.block_until_ready(run(*args))
    compile_s = time.time() - t0
    err = max(float(np.abs(np.asarray(got[k], np.float64)
                           - np.asarray(want[k], np.float64)).max())
              for k in want)
    ok = err == 0.0
    print(f"segment P: maxerr {err:.2e} vs XLA postprocess "
          f"({'OK' if ok else 'FAIL'}, tol bit-exact); "
          f"compile+first-run {compile_s:.0f} s")

    iters = 50

    @jax.jit
    def chained(s, rest):
        def body(_, s):
            r = run(s, *rest)
            return s + (jnp.sum(r["scores"]) + jnp.sum(r["boxes"])) * 1e-30
        return jax.lax.fori_loop(0, iters, body, s)

    rest = args[1:]
    jax.block_until_ready(chained(args[0], rest))
    t0 = time.perf_counter()
    jax.block_until_ready(chained(args[0], rest))
    per_call_ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"segment P: {per_call_ms:.3f} ms/call chained (batch 128, "
          f"prep GEMMs + kernel)")

    if not interp:
        report = json.load(open(OUT)) if os.path.exists(OUT) else {}
        report["P"] = {"maxerr_vs_xla": err, "ok": ok, "tol": 0.0,
                       "chained_ms_per_call": round(per_call_ms, 3),
                       "batch": 128, "compile_s": round(compile_s, 1)}
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", OUT)
    else:
        print("(interpret plumbing check — docs JSON not written)")
    sys.exit(0 if ok else 1)


def worstcase_regression(interp: bool):
    """'W': the fused postprocess kernel under WORST-CASE NMS load —
    score_threshold 0.0 admits all 896 anchors, iou_threshold 0.01 defeats
    suppression, so every one of the 128 lanes runs the full max_faces=100
    selection/extraction trips.  Bit-exact gate vs the XLA postprocess
    (first validated on-chip by hand late round 3: maxerr 0.0, 100
    survivors/lane)."""
    import jax
    import jax.numpy as jnp

    from headpose_tpu.models.anchors import generate_anchors
    from headpose_tpu.ops.detection import postprocess
    from headpose_tpu.ops.pallas.postprocess import postprocess_pallas

    anchors = jnp.asarray(generate_anchors().astype(np.float32))
    a = anchors.shape[0]
    rng = np.random.default_rng(99)
    b = 128
    args = (jnp.asarray(rng.normal(0.0, 2.0, (b, a)).astype(np.float32)),
            jnp.asarray(rng.normal(0.0, 8.0, (b, a, 16)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.5, (b, 16, 16, 3)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.5, (b, 8, 8, 3)).astype(np.float32)))
    kw = dict(score_threshold=0.0, iou_threshold=0.01, max_faces=100)

    want = jax.jit(jax.vmap(
        lambda s, l, pf, pb: postprocess(s, l, pf, pb, anchors, **kw)))(*args)
    run = jax.jit(lambda s, l, pf, pb: postprocess_pallas(
        s, l, pf, pb, anchors, interpret=interp, **kw))
    t0 = time.time()
    got = jax.block_until_ready(run(*args))
    compile_s = time.time() - t0
    err = max(float(np.abs(np.asarray(got[k], np.float64)
                           - np.asarray(want[k], np.float64)).max())
              for k in want)
    nval = int(np.asarray(got["valid"]).sum())
    ok = err == 0.0 and nval == b * kw["max_faces"]
    print(f"segment W: maxerr {err:.2e} vs XLA postprocess, "
          f"{nval} survivors ({nval // b}/lane, want {kw['max_faces']}) "
          f"({'OK' if ok else 'FAIL'}); compile+first-run {compile_s:.0f} s")

    if not interp:
        report = json.load(open(OUT)) if os.path.exists(OUT) else {}
        report["W"] = {"maxerr_vs_xla": err, "ok": ok, "tol": 0.0,
                       "survivors_per_lane": nval // b, "batch": b,
                       "compile_s": round(compile_s, 1)}
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", OUT)
    else:
        print("(interpret plumbing check — docs JSON not written)")
    sys.exit(0 if ok else 1)


def main():
    import jax
    import jax.numpy as jnp

    from headpose_tpu.ops.pallas import backbone2 as bb2
    from headpose_tpu.pretrained import load_flagship

    seg = sys.argv[1].upper()
    interp = len(sys.argv) > 2 and sys.argv[2] == "interpret"
    if interp:   # CPU plumbing check (fast); on-chip numbers need the real run
        jax.config.update("jax_platforms", "cpu")
    if seg == "P":
        postprocess_regression(interp)
        return
    if seg == "W":
        worstcase_regression(interp)
        return
    assert seg in bb2.SEGMENTS, \
        f"segment must be one of {list(bb2.SEGMENTS)}, P, or W"

    model, params = load_flagship()
    spec, bp = model.backbone, params["backbone"]
    rng = np.random.default_rng(0)
    x_img = rng.uniform(-1, 1, (BATCH, 128, 128, 3)).astype(np.float32)
    bounds = xla_boundaries(spec, bp, jnp.asarray(x_img))
    # drift guard: xla_boundaries re-implements the block forward to expose
    # segment boundaries; its tap activations must match the REAL serving
    # forward (models.blazeface.apply) or the <= TOL gate below would
    # validate kernels against a stale reference
    with jax.default_matmul_precision("highest"):
        ref = spec.apply(bp, jnp.asarray(x_img))
    for name, key in (("feat88", "b10"), ("feat96", "b15")):
        err = float(jnp.abs(ref[name] - bounds[key]).max())
        assert err <= 1e-5, (
            f"xla_boundaries drifted from blazeface.apply: {name} maxerr "
            f"{err:.2e}")
    packed = bb2.pack_backbone(spec, bp)

    x, want, h = segment_io(seg, spec, bounds)
    t = bb2.SEGMENTS[seg][4]
    run = jax.jit(lambda v: bb2.run_segment(spec, packed[seg], v, seg=seg,
                                            interpret=interp))

    print(f"segment {seg}: compiling on chip (Mosaic, may take 100-550 s)...")
    t0 = time.time()
    y = jax.block_until_ready(run(x))
    compile_s = time.time() - t0

    c = want.shape[-1]
    got = np.asarray(bb2._unflatten_nchw(
        bb2._uncoalesce(y, t, bb2._geom(h)[1]), h, c)).transpose(0, 2, 3, 1)
    err = float(np.abs(got - want).max())
    ok = err <= TOL
    print(f"segment {seg}: maxerr {err:.2e} vs XLA ({'OK' if ok else 'FAIL'}"
          f", tol {TOL}); compile+first-run {compile_s:.0f} s")

    # chained-dependency timing: data dependence through iterations defeats
    # the runtime's same-dispatch elision
    iters = 50

    @jax.jit
    def chained(v):
        def body(_, v):
            return v + jnp.sum(run_inner(v)) * 1e-30
        return jax.lax.fori_loop(0, iters, body, v)

    run_inner = lambda v: bb2.run_segment(spec, packed[seg], v, seg=seg,
                                          interpret=interp)
    jax.block_until_ready(chained(x))          # reuses the compiled kernel
    t0 = time.perf_counter()
    jax.block_until_ready(chained(x))
    per_call_ms = (time.perf_counter() - t0) / iters * 1e3

    print(f"segment {seg}: {per_call_ms:.3f} ms/call chained "
          f"(batch {BATCH}, coalescing t={t})")

    if interp:
        print("(interpret plumbing check — docs JSON not written)")
    else:
        report = json.load(open(OUT)) if os.path.exists(OUT) else {}
        report[seg] = {"maxerr_vs_xla": err, "ok": ok, "tol": TOL,
                       "chained_ms_per_call": round(per_call_ms, 3),
                       "batch": BATCH, "compile_s": round(compile_s, 1)}
        with open(OUT, "w") as f:
            json.dump(report, f, indent=1)
        print("wrote", OUT)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
