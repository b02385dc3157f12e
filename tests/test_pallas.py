"""Pallas kernel tests (interpret mode — CPU-runnable, numerics-exact).

The same kernels were validated compiled on a real TPU v5e chip:
  mlp_head_forward:        maxerr 0.0 vs XLA, 1.28 ms / 131k rows
  se_transformer_forward:  maxerr 0.012 vs XLA (both default-precision MXU),
                           2.40 ms / 256 16x16x88 maps
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headpose_tpu.models import MLPHead, SETransformerHead
from headpose_tpu.ops.pallas import mlp_head_forward, se_transformer_forward


class TestMLPKernel:
    @pytest.mark.parametrize("layers", [
        ((32, "tanh"), (16, "tanh"), (3, "linear")),   # hrchr82r arch
        ((64, "softsign"), (3, "linear")),              # stoqa9pt arch
        ((3, "linear"),),                               # trivial head
    ])
    def test_matches_reference_apply(self, layers):
        spec = MLPHead(96, layers)
        params = spec.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(0).normal(size=(700, 96)).astype(np.float32)
        y_ref = np.asarray(spec.apply(params, x))
        y_pl = np.asarray(mlp_head_forward(spec, params, jnp.asarray(x),
                                           interpret=True))
        np.testing.assert_allclose(y_pl, y_ref, rtol=1e-6, atol=1e-6)

    def test_ragged_rows(self):
        """Row counts that don't divide the tile must pad+trim correctly."""
        spec = MLPHead(88, ((8, "tanh"), (3, "linear")))
        params = spec.init(jax.random.PRNGKey(1))
        x = np.random.default_rng(1).normal(size=(513, 88)).astype(np.float32)
        y = np.asarray(mlp_head_forward(spec, params, jnp.asarray(x),
                                        tile=256, interpret=True))
        assert y.shape == (513, 3)
        y_ref = np.asarray(spec.apply(params, x))
        np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-6)


class TestSEAttentionKernel:
    def test_matches_reference_apply(self):
        spec = SETransformerHead(in_features=88)
        params = spec.init(jax.random.PRNGKey(2))
        x = np.random.default_rng(2).normal(size=(3, 16, 16, 88)).astype(np.float32)
        y_ref = np.asarray(spec.apply(params, jnp.asarray(x)))
        y_pl = np.asarray(se_transformer_forward(spec, params, jnp.asarray(x),
                                                 interpret=True))
        np.testing.assert_allclose(y_pl, y_ref, rtol=1e-4, atol=1e-5)

    def test_8x8_maps(self):
        spec = SETransformerHead(in_features=96, num_heads=2, key_dim=8)
        params = spec.init(jax.random.PRNGKey(3))
        x = np.random.default_rng(3).normal(size=(2, 8, 8, 96)).astype(np.float32)
        y_ref = np.asarray(spec.apply(params, jnp.asarray(x)))
        y_pl = np.asarray(se_transformer_forward(spec, params, jnp.asarray(x),
                                                 interpret=True))
        assert y_pl.shape == (2, 8, 8, 3)
        np.testing.assert_allclose(y_pl, y_ref, rtol=1e-4, atol=1e-5)


class TestFusedBackbone:
    @pytest.mark.skipif(
        __import__("headpose_tpu.pretrained",
                   fromlist=["flagship_path"]).flagship_path() is None,
        reason="needs the shipped pretrained flagship")
    def test_matches_xla_backbone(self):
        """The fully-fused backbone kernel (all 17 layers VMEM-resident)
        matches the XLA backbone at f32 within float accumulation noise."""
        from headpose_tpu.pretrained import load_flagship
        from headpose_tpu.ops.pallas.backbone import backbone_forward

        model, params = load_flagship()
        bb = model.backbone
        x = np.random.default_rng(0).uniform(-1, 1, (5, 128, 128, 3)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            ref = bb.apply(params["backbone"], x)
        f88, f96 = backbone_forward(bb, params["backbone"], x, tile=4,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(f88), np.asarray(ref["feat88"]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(f96), np.asarray(ref["feat96"]),
                                   rtol=1e-4, atol=1e-5)


class TestFusedBackbone2:
    """backbone2: the segment kernels that COMPILE on the real chip (r2).

    On-chip validation (TPU v5e, 2026-08-16): all four segments compile
    through the Mosaic toolchain and match the XLA backbone to <=1.2e-4;
    e2e pose error 0.003 deg on the golden images."""

    @pytest.mark.heavy  # 23s interpret-mode; kernel regression refreshed on-chip per round
    def test_segments_and_fused_match_xla(self):
        from headpose_tpu.pretrained import load_flagship
        from headpose_tpu.ops.pallas.backbone2 import (apply_fused,
                                                       pack_backbone)

        model, params = load_flagship()
        bb = model.backbone
        x = np.random.default_rng(0).uniform(
            -1, 1, (8, 128, 128, 3)).astype(np.float32)
        with jax.default_matmul_precision("highest"):
            ref = bb.apply(params["backbone"], x)
        packed = pack_backbone(bb, params["backbone"])
        f88, f96 = apply_fused(bb, params["backbone"], packed,
                               jnp.asarray(x), interpret=True)
        np.testing.assert_allclose(np.asarray(f88), np.asarray(ref["feat88"]),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(f96), np.asarray(ref["feat96"]),
                                   atol=5e-4)


class TestDenseComposedBackbone:
    """The 'fast' serving mode: depthwise+pointwise composed into one dense
    3x3 conv per block (exact math — no nonlinearity between them)."""

    def test_dense_equals_separable(self):
        from headpose_tpu.pretrained import load_flagship

        model, params = load_flagship()
        x = np.random.default_rng(1).uniform(
            -1, 1, (4, 128, 128, 3)).astype(np.float32)
        a = model.backbone.apply(params["backbone"], x)
        b = model.backbone.apply(params["backbone"], x, dense=True)
        np.testing.assert_allclose(np.asarray(a["feat88"]),
                                   np.asarray(b["feat88"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(a["scores"]),
                                   np.asarray(b["scores"]), atol=1e-4)

    def test_fast_detector_golden_parity(self):
        import os
        from headpose_tpu.pretrained import flagship_detector

        g = np.load(os.path.join(os.path.dirname(__file__),
                                 "golden", "e2e_production.npz"))
        det = flagship_detector(precision="fast")
        res = det.detect_single(np.asarray(g["img"], np.uint8))
        assert len(res.scores) == len(g["scores"])
        np.testing.assert_allclose(res.poses, g["poses"], atol=1e-3)

    def test_turbo_detector_golden_parity(self):
        """'turbo' (precision islands: trailing blocks + SSD heads at
        single-pass bf16) plumbing check.  On CPU all precisions execute as
        f32; the on-chip corpus-certified distribution (p99 0.22 deg —
        a NON-parity accuracy mode) is in docs/certification.json."""
        import os
        from headpose_tpu.pretrained import flagship_detector

        g = np.load(os.path.join(os.path.dirname(__file__),
                                 "golden", "e2e_production.npz"))
        det = flagship_detector(precision="turbo")
        res = det.detect_single(np.asarray(g["img"], np.uint8))
        assert len(res.scores) == len(g["scores"])
        np.testing.assert_allclose(res.poses, g["poses"], atol=1e-3)

    def test_max_detector_golden_parity(self):
        """'max' (every block on the single-pass-bf16 island) must keep
        golden parity on CPU, where all precisions execute as f32 — this
        validates the plumbing; the on-chip error (0.26 deg, identical
        detection sets) is recorded in docs/BENCH.md."""
        import os
        from headpose_tpu.pretrained import flagship_detector

        g = np.load(os.path.join(os.path.dirname(__file__),
                                 "golden", "e2e_production.npz"))
        det = flagship_detector(precision="max")
        res = det.detect_single(np.asarray(g["img"], np.uint8))
        assert len(res.scores) == len(g["scores"])
        np.testing.assert_allclose(res.poses, g["poses"], atol=1e-3)


class TestFusedPostprocess:
    """ops/pallas/postprocess.py: the fused score-filter + selection-NMS +
    survivor-extraction + pose-lookup kernel must be BIT-EXACT against
    vmap(ops.detection.postprocess) — both implement
    tf.image.non_max_suppression semantics (greedy descending-score,
    lower-index tie-break), so there is no tolerance to hide behind."""

    @staticmethod
    def _run(b, thr, iou, mf, seed, loc_std=8.0, bias=0.0, quantize=False):
        from headpose_tpu.models.anchors import generate_anchors
        from headpose_tpu.ops import detection as det
        from headpose_tpu.ops.pallas.postprocess import postprocess_pallas

        anchors = jnp.asarray(generate_anchors().astype(np.float32))
        a = anchors.shape[0]
        rng = np.random.default_rng(seed)
        logits = (rng.normal(0.0, 2.0, (b, a)) + bias).astype(np.float32)
        if quantize:
            # many EXACT score ties — the greedy argmax's lower-index
            # tie-break (tf.image.non_max_suppression semantics) must agree
            # between the kernel and the XLA path; random floats never tie
            logits = np.round(logits).astype(np.float32)
        loc = rng.normal(0.0, loc_std, (b, a, 16)).astype(np.float32)
        pf = rng.normal(0, 0.5, (b, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 0.5, (b, 8, 8, 3)).astype(np.float32)
        ref = jax.vmap(lambda s, l, f, bk: det.postprocess(
            s, l, f, bk, anchors, score_threshold=thr, iou_threshold=iou,
            max_faces=mf))(jnp.asarray(logits), jnp.asarray(loc),
                           jnp.asarray(pf), jnp.asarray(pb))
        got = postprocess_pallas(
            jnp.asarray(logits), jnp.asarray(loc), jnp.asarray(pf),
            jnp.asarray(pb), anchors, score_threshold=thr, iou_threshold=iou,
            max_faces=mf, interpret=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]), err_msg=k)

    @pytest.mark.parametrize("case", [
        dict(b=8, thr=0.4, iou=0.3, mf=16, seed=1),
        dict(b=3, thr=0.4, iou=0.3, mf=100, seed=3),            # odd batch
        dict(b=8, thr=0.99, iou=0.3, mf=16, seed=5, bias=-8.0),  # all empty
        dict(b=4, thr=0.0, iou=0.3, mf=100, seed=6),             # keep all
        dict(b=8, thr=0.4, iou=0.01, mf=32, seed=8),             # heavy NMS
        dict(b=2, thr=0.0, iou=0.01, mf=100, seed=99),  # worst case: all 896
        # anchors admitted AND suppression defeated -> full 100-trip
        # extraction in every lane (scripts/kernel_regression.py segment W)
        dict(b=8, thr=0.4, iou=0.3, mf=16, seed=9, loc_std=0.5),  # clusters
        dict(b=4, thr=1.0, iou=0.3, mf=16, seed=2),     # keep-NONE endpoint
        dict(b=8, thr=0.4, iou=0.3, mf=32, seed=11, quantize=True),  # exact
        # score ties -> lower-index tie-break must match
        dict(b=4, thr=0.0, iou=0.01, mf=100, seed=12, quantize=True,
             loc_std=0.5),  # ties + defeated suppression + clustered boxes
    ])
    def test_bit_exact_vs_xla(self, case):
        self._run(**case)

    def test_detector_e2e_bit_exact(self):
        """postprocess='pallas' through the full FaceDetector pipeline must
        reproduce the 'xla' backend bit for bit on golden image content."""
        import os
        from headpose_tpu.pretrained import flagship_detector

        g = np.load(os.path.join(os.path.dirname(__file__),
                                 "golden", "e2e_production.npz"))
        img = np.asarray(g["img"], np.uint8)[None]
        rx = flagship_detector(postprocess="xla").detect(img)
        rp = flagship_detector(postprocess="pallas").detect(img)
        for k in ("boxes", "keypoints", "scores", "poses", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(rp, k)),
                                          np.asarray(getattr(rx, k)),
                                          err_msg=k)

    def test_nonfinite_logits_stay_clean_and_agree(self):
        """A NaN or -inf logit on an UNSELECTED anchor must not poison the
        image's extracted scores (the reference's np.where filter drops such
        anchors before any arithmetic).  Regression: the XLA one-hot GEMM
        used to NaN the whole image while the kernel stayed clean."""
        from headpose_tpu.models.anchors import generate_anchors
        from headpose_tpu.ops import detection as det
        from headpose_tpu.ops.pallas.postprocess import postprocess_pallas

        anchors = jnp.asarray(generate_anchors().astype(np.float32))
        a = anchors.shape[0]
        rng = np.random.default_rng(11)
        logits = rng.normal(0.0, 2.0, (2, a)).astype(np.float32)
        logits[0, 5] = np.nan
        logits[1, 7] = -np.inf
        loc = rng.normal(0.0, 8.0, (2, a, 16)).astype(np.float32)
        pf = rng.normal(0, 0.5, (2, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 0.5, (2, 8, 8, 3)).astype(np.float32)
        ref = jax.vmap(lambda s, l, f, bk: det.postprocess(
            s, l, f, bk, anchors, max_faces=16))(
            jnp.asarray(logits), jnp.asarray(loc),
            jnp.asarray(pf), jnp.asarray(pb))
        got = postprocess_pallas(jnp.asarray(logits), jnp.asarray(loc),
                                 jnp.asarray(pf), jnp.asarray(pb), anchors,
                                 max_faces=16, interpret=True)
        assert np.isfinite(np.asarray(ref["scores"])).all()
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]), err_msg=k)

    def test_back_camera_config_bit_exact(self):
        """The kernel is layout-generic: the 256-input back-camera anchor
        table and input_size must agree with the XLA backend too."""
        from headpose_tpu.models.anchors import BACK_CONFIG, generate_anchors
        from headpose_tpu.ops import detection as det
        from headpose_tpu.ops.pallas.postprocess import postprocess_pallas

        anchors = jnp.asarray(generate_anchors(BACK_CONFIG).astype(np.float32))
        a = anchors.shape[0]
        rng = np.random.default_rng(21)
        logits = rng.normal(0.0, 2.0, (4, a)).astype(np.float32)
        loc = rng.normal(0.0, 16.0, (4, a, 16)).astype(np.float32)
        pf = rng.normal(0, 0.5, (4, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 0.5, (4, 8, 8, 3)).astype(np.float32)
        ref = jax.vmap(lambda s, l, f, bk: det.postprocess(
            s, l, f, bk, anchors, input_size=256, max_faces=16))(
            jnp.asarray(logits), jnp.asarray(loc),
            jnp.asarray(pf), jnp.asarray(pb))
        got = postprocess_pallas(jnp.asarray(logits), jnp.asarray(loc),
                                 jnp.asarray(pf), jnp.asarray(pb), anchors,
                                 input_size=256, max_faces=16, interpret=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]), err_msg=k)


class TestNonfiniteSanitization:
    """Round-3 hardening: non-finite backbone outputs must never poison the
    masked-GEMM extraction, in EITHER backend, and the backends must stay
    bit-exact (ops.detection.sanitize_model_outputs)."""

    def _run_both(self, logits, loc, max_faces=16):
        from headpose_tpu.models.anchors import generate_anchors
        from headpose_tpu.ops import detection as det
        from headpose_tpu.ops.pallas.postprocess import postprocess_pallas
        anchors = jnp.asarray(generate_anchors().astype(np.float32))
        rng = np.random.default_rng(3)
        b = logits.shape[0]
        pf = rng.normal(0, 0.5, (b, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 0.5, (b, 8, 8, 3)).astype(np.float32)
        ref = jax.vmap(lambda s, l, f, bk: det.postprocess(
            s, l, f, bk, anchors, max_faces=max_faces))(
            jnp.asarray(logits), jnp.asarray(loc),
            jnp.asarray(pf), jnp.asarray(pb))
        got = postprocess_pallas(jnp.asarray(logits), jnp.asarray(loc),
                                 jnp.asarray(pf), jnp.asarray(pb), anchors,
                                 max_faces=max_faces, interpret=True)
        for k in ref:
            np.testing.assert_array_equal(np.asarray(got[k]),
                                          np.asarray(ref[k]), err_msg=k)
        return {k: np.asarray(v) for k, v in ref.items()}

    def _anchors_count(self):
        from headpose_tpu.models.anchors import generate_anchors
        return generate_anchors().shape[0]

    def test_nan_loc_on_rejected_anchor_does_not_poison(self):
        """loc NaN on a below-threshold anchor: the reference filters before
        decoding, so every emitted box/keypoint must stay finite."""
        a = self._anchors_count()
        rng = np.random.default_rng(5)
        logits = rng.normal(0.0, 2.0, (1, a)).astype(np.float32)
        logits[0, 5] = -10.0                    # rejected at threshold 0.4
        loc = rng.normal(0.0, 8.0, (1, a, 16)).astype(np.float32)
        loc[0, 5, :] = np.nan
        out = self._run_both(logits, loc)
        n = int(out["valid"][0].sum())
        assert n >= 1
        assert np.isfinite(out["boxes"][0][:n]).all()
        assert np.isfinite(out["keypoints"][0][:n]).all()
        assert np.isfinite(out["scores"][0]).all()

    def test_above_threshold_inf_logit_scores_stay_clean(self):
        """+inf logit PASSES the threshold: it must behave as the top
        candidate with score exactly 1.0, and every other detection's score
        must stay finite (0 * inf = nan regression)."""
        a = self._anchors_count()
        rng = np.random.default_rng(6)
        logits = np.full((1, a), -10.0, np.float32)
        logits[0, 700] = np.inf
        logits[0, 5] = 3.0
        loc = np.zeros((1, a, 16), np.float32)
        # spread boxes so NMS keeps both
        loc[0, 700, 0] = 40.0
        out = self._run_both(logits, loc)
        assert int(out["valid"][0].sum()) == 2
        assert np.isfinite(out["scores"][0]).all()
        np.testing.assert_allclose(out["scores"][0][0], 1.0)

    def test_threshold_zero_drops_sigmoid_underflow(self):
        """score_threshold=0 replicates the reference's STRICT prob > 0
        filter: a logit whose f32 sigmoid underflows to exactly 0.0 must be
        dropped, not kept by a -inf logit threshold."""
        a = self._anchors_count()
        logits = np.full((1, a), -200.0, np.float32)  # sigmoid == 0.0 in f32
        logits[0, 3] = 2.0
        loc = np.zeros((1, a, 16), np.float32)
        from headpose_tpu.models.anchors import generate_anchors
        from headpose_tpu.ops import detection as det
        anchors = jnp.asarray(generate_anchors().astype(np.float32))
        rng = np.random.default_rng(7)
        pf = rng.normal(0, 0.5, (16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 0.5, (8, 8, 3)).astype(np.float32)
        out = det.postprocess(jnp.asarray(logits[0]), jnp.asarray(loc[0]),
                              jnp.asarray(pf), jnp.asarray(pb), anchors,
                              score_threshold=0.0, max_faces=16)
        assert int(np.asarray(out["valid"]).sum()) == 1  # only the real one


def test_pallas_postprocess_traces_under_jit():
    """The wrapper builds host-side constants (_cell_matrix) during trace:
    it must work INSIDE jax.jit, not just eagerly (regression: jnp ops in
    the constant builder were captured into the trace and crashed)."""
    from headpose_tpu.models.anchors import generate_anchors
    from headpose_tpu.ops.pallas.postprocess import postprocess_pallas
    import functools
    anchors = jnp.asarray(generate_anchors().astype(np.float32))
    a = anchors.shape[0]
    rng = np.random.default_rng(1)
    logits = rng.normal(0.0, 2.0, (2, a)).astype(np.float32)
    loc = rng.normal(0.0, 8.0, (2, a, 16)).astype(np.float32)
    pf = rng.normal(0, 0.5, (2, 16, 16, 3)).astype(np.float32)
    pb = rng.normal(0, 0.5, (2, 8, 8, 3)).astype(np.float32)
    fn = jax.jit(functools.partial(postprocess_pallas, max_faces=8,
                                   interpret=True))
    got = fn(jnp.asarray(logits), jnp.asarray(loc),
             jnp.asarray(pf), jnp.asarray(pb), anchors)
    eager = postprocess_pallas(jnp.asarray(logits), jnp.asarray(loc),
                               jnp.asarray(pf), jnp.asarray(pb), anchors,
                               max_faces=8, interpret=True)
    for k in eager:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(eager[k]), err_msg=k)
