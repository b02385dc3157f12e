"""Parity tests for preprocessing + detection post-processing + e2e runtime
against goldens captured from the reference pipeline."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headpose_tpu.models.anchors import generate_anchors
from headpose_tpu.ops import resize_bicubic, preprocess, postprocess, pairwise_iou
from headpose_tpu.runtime import smooth_sequence, TrackSmoother

from conftest import REFERENCE_ROOT, has_reference

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
needs_reference = pytest.mark.skipif(
    not has_reference(), reason="reference artifacts not mounted")


@pytest.mark.smoke
class TestResize:
    def test_bicubic_matches_tf(self):
        """Pixel-exact vs tf.image.resize(method='bicubic') — the hard parity
        risk called out in SURVEY.md §7."""
        g = np.load(os.path.join(GOLDEN, "resize_bicubic.npz"))
        for i in range(3):
            out = np.asarray(resize_bicubic(jnp.asarray(g[f"img{i}"]), (128, 128)))
            np.testing.assert_allclose(out, g[f"resized{i}"], atol=1e-5)

    def test_batched(self):
        imgs = np.random.default_rng(0).uniform(size=(3, 77, 99, 3)).astype(np.float32)
        out = np.asarray(resize_bicubic(jnp.asarray(imgs), (128, 128)))
        single = np.asarray(resize_bicubic(jnp.asarray(imgs[1]), (128, 128)))
        np.testing.assert_allclose(out[1], single, atol=1e-6)

    def test_bicubic_nondyadic_phase_matches_tf(self):
        """TF's ResizeBicubic reads a 1024-bin coefficient table, quantizing
        the fractional phase to 1/1024 (resize_bicubic_op.cc); non-dyadic
        output sizes land off-grid, so exact parity needs the same
        quantization (round-3 fix).  Built in-test — the committed golden
        covers only 128-output sizes."""
        tf = pytest.importorskip("tensorflow")
        rng = np.random.default_rng(7)
        img = rng.uniform(size=(100, 70, 3)).astype(np.float32)
        want = tf.image.resize(img, [47, 33], method="bicubic").numpy()
        got = np.asarray(resize_bicubic(jnp.asarray(img), (47, 33)))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_numpy_twin_matches_jax_and_goldens(self):
        """resize_bicubic_np (the no-JAX edge path, ops/bicubic.py) applies
        the SAME interpolation matrices as the JAX GEMM path — TF-golden
        parity and near-bit agreement with the JAX path (both are f32
        matmuls; only BLAS-vs-XLA summation order differs)."""
        from headpose_tpu.ops.bicubic import resize_bicubic_np

        g = np.load(os.path.join(GOLDEN, "resize_bicubic.npz"))
        for i in range(3):
            out = resize_bicubic_np(g[f"img{i}"], (128, 128))
            np.testing.assert_allclose(out, g[f"resized{i}"], atol=1e-5)
        img = np.random.default_rng(3).uniform(
            size=(480, 480, 3)).astype(np.float32)
        jx = np.asarray(resize_bicubic(jnp.asarray(img), (128, 128)))
        np.testing.assert_allclose(resize_bicubic_np(img, (128, 128)), jx,
                                   atol=2e-6)
        # same-size fast path: f32 cast, like the JAX contract
        u8 = (img[:4, :4] * 255).astype(np.uint8)
        assert resize_bicubic_np(u8, (4, 4)).dtype == np.float32

    def test_same_size_noop_promotes_to_f32(self):
        """The no-resize fast path must keep the f32 output contract of the
        resize paths (round-3 fix: uint8 used to pass through unpromoted)."""
        img = np.random.default_rng(0).integers(0, 256, (128, 128, 3), dtype=np.uint8)
        out = resize_bicubic(jnp.asarray(img), (128, 128))
        assert out.dtype == jnp.float32

    def test_channel_order_validated(self):
        with pytest.raises(ValueError, match="channel_order"):
            preprocess(jnp.zeros((4, 4, 3), jnp.float32), channel_order="bgra")

    def test_preprocess_range(self):
        img = np.random.default_rng(0).integers(0, 256, (240, 320, 3)).astype(np.uint8)
        x = np.asarray(preprocess(jnp.asarray(img)))
        assert x.shape == (128, 128, 3)
        # Keys bicubic overshoots slightly (negative lobes); the reference
        # doesn't clip either — parity means we don't clip.
        assert x.min() >= -1.5 and x.max() <= 1.5


@pytest.mark.smoke
class TestPostprocess:
    def _run_case(self, g, case, score_threshold):
        anchors = jnp.asarray(generate_anchors(), jnp.float32)
        post = jax.jit(lambda s, l, pf, pb: postprocess(
            s, l, pf, pb, anchors, score_threshold=score_threshold))(
            jnp.asarray(g[f"cls{case}"]), jnp.asarray(g[f"loc{case}"]),
            jnp.asarray(g[f"pose_front{case}"]), jnp.asarray(g[f"pose_back{case}"]))
        valid = np.asarray(post["valid"])
        n = int(valid.sum())
        # our outputs are score-descending and dense in the first n slots
        assert valid[:n].all() and not valid[n:].any()
        return {k: np.asarray(v)[:n] for k, v in post.items()}, n

    @pytest.mark.parametrize("case", [0, 1, 2])
    def test_parity_with_reference(self, case):
        """Same surviving detections, boxes, keypoints, scores, and poses as
        the reference decode + tf NMS + pose lookup (goldens captured by
        driving the reference's own methods on synthetic raw outputs)."""
        g = np.load(os.path.join(GOLDEN, "postprocess.npz"))
        ours, n = self._run_case(g, case, score_threshold=0.4)
        ref_scores = g[f"scores{case}"]
        assert n == len(ref_scores)
        np.testing.assert_allclose(ours["scores"], ref_scores, atol=1e-5)
        np.testing.assert_allclose(ours["boxes"], g[f"boxes{case}"], atol=1e-5)
        np.testing.assert_allclose(ours["keypoints"], g[f"keypoints{case}"], atol=1e-5)
        np.testing.assert_allclose(ours["poses"], g[f"poses{case}"], atol=1e-5)

    def test_no_detections(self):
        anchors = jnp.asarray(generate_anchors(), jnp.float32)
        post = postprocess(jnp.full((896,), -10.0), jnp.zeros((896, 16)),
                           jnp.zeros((16, 16, 3)), jnp.zeros((8, 8, 3)), anchors)
        assert int(np.asarray(post["valid"]).sum()) == 0

    def test_iou(self):
        boxes = jnp.asarray([[0, 0, 1, 1], [0, 0, 1, 1], [0.5, 0.5, 1.5, 1.5],
                             [2, 2, 3, 3]], jnp.float32)
        iou = np.asarray(pairwise_iou(boxes))
        assert np.isclose(iou[0, 1], 1.0)
        assert np.isclose(iou[0, 2], 0.25 / 1.75)
        assert iou[0, 3] == 0.0


@needs_reference
@pytest.mark.smoke
class TestEndToEnd:
    @pytest.fixture()
    def detector(self, production_detector):
        # session-cached; thresholds match the e2e golden capture (0.05)
        return production_detector

    @pytest.mark.parametrize("case", [0, 1])
    def test_detect_parity(self, detector, case):
        """Full image → Results parity with the reference detectFaces path."""
        g = np.load(os.path.join(GOLDEN, "e2e.npz"))
        res = detector.detect_single(g[f"img{case}"])
        ref_n = len(g[f"scores{case}"])
        assert len(res) == ref_n
        np.testing.assert_allclose(res.scores, g[f"scores{case}"], atol=1e-4)
        np.testing.assert_allclose(res.boxes, g[f"boxes{case}"], atol=1e-4)
        np.testing.assert_allclose(res.keypoints, g[f"keypoints{case}"], atol=1e-4)
        np.testing.assert_allclose(res.poses, g[f"poses{case}"], atol=5e-4)

    def test_batched_detect(self, detector):
        g = np.load(os.path.join(GOLDEN, "e2e.npz"))
        imgs = np.stack([g["img0"], g["img0"]])
        batch = detector.detect(imgs)
        assert batch.boxes.shape[0] == 2
        res = batch.trim()
        np.testing.assert_allclose(res[0].scores, res[1].scores, atol=1e-6)


class TestSmoothing:
    def test_matches_scalar_ema(self):
        """Same recurrence as the reference EMAFilter (y = αx + (1-α)y)."""
        alpha = 0.15
        xs = np.random.default_rng(0).normal(size=(20,)).astype(np.float32)
        # scalar reference recurrence
        y, out_ref = None, []
        for x in xs:
            y = x if y is None else alpha * x + (1 - alpha) * y
            out_ref.append(y)
        smoothed = np.asarray(smooth_sequence(jnp.asarray(xs)[:, None], alpha))[:, 0]
        np.testing.assert_allclose(smoothed, out_ref, rtol=1e-5)

    def test_per_slot_independence(self):
        """Two face slots must smooth independently (the reference shared one
        filter bank across faces — a bug SURVEY.md flags; we key per slot)."""
        sm = TrackSmoother(alpha=0.5)
        a = jnp.asarray([[1.0], [100.0]])
        out1 = sm(a)
        out2 = np.asarray(sm(jnp.asarray([[2.0], [200.0]])))
        assert np.isclose(out2[0, 0], 1.5)
        assert np.isclose(out2[1, 0], 150.0)
        del out1

    def test_invalid_slots_hold_state(self):
        sm = TrackSmoother(alpha=0.5)
        sm(jnp.asarray([[10.0]]), valid=jnp.asarray([True]))
        out = np.asarray(sm(jnp.asarray([[999.0]]), valid=jnp.asarray([False])))
        assert np.isclose(out[0, 0], 10.0)


@needs_reference
def test_from_h5_compat_matches_native(production_detector):
    """The graph-compiler-backed detector (works for ANY unified H5) must
    produce the same detections as the native import path."""
    from headpose_tpu.runtime import FaceDetector
    from conftest import UNIFIED_H5
    det = FaceDetector.from_h5_compat(UNIFIED_H5, score_threshold=0.05)
    g = np.load(os.path.join(GOLDEN, "e2e.npz"))
    res = det.detect_single(g["img0"])
    ref = production_detector.detect_single(g["img0"])
    assert len(res) == len(ref)
    np.testing.assert_allclose(res.scores, ref.scores, atol=1e-5)
    np.testing.assert_allclose(res.poses, ref.poses, atol=1e-3)


@needs_reference
def test_from_h5_compat_rejects_accelerated_precision():
    """Graph-compiled models carry no backbone spec, so the dense/bf16-island
    serving modes cannot apply — requesting one must raise, not silently run
    a different (ambient-precision) configuration."""
    import pytest
    from headpose_tpu.runtime import FaceDetector
    from conftest import UNIFIED_H5
    det = FaceDetector.from_h5_compat(UNIFIED_H5, precision="turbo")
    with pytest.raises(ValueError, match="native backbone spec"):
        det.detect_single(np.zeros((64, 64, 3), np.uint8))
    det.precision = "highest"   # mutation retraces; supported mode works
    det.detect_single(np.zeros((64, 64, 3), np.uint8))


@needs_reference
def test_detect_stream_order_and_parity(production_detector):
    """Streaming wrapper yields in-order results identical to direct detect."""
    from headpose_tpu.runtime.streaming import detect_stream
    g = np.load(os.path.join(GOLDEN, "e2e.npz"))
    b0 = np.stack([g["img0"], g["img0"]])
    b1 = np.stack([g["img1"][:256, :256], g["img1"][:256, :256]])
    outs = list(detect_stream(production_detector, [b0, b1, b0], prefetch=2))
    assert len(outs) == 3
    direct = production_detector.detect(b0)
    np.testing.assert_allclose(np.asarray(outs[0].scores),
                               np.asarray(direct.scores), atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[2].scores),
                               np.asarray(direct.scores), atol=1e-6)


@needs_reference
def test_detect_accepts_float_and_uint8(production_detector):
    """uint8 and float 0-255 inputs give identical detections."""
    g = np.load(os.path.join(GOLDEN, "e2e.npz"))
    r1 = production_detector.detect_single(g["img0"])
    r2 = production_detector.detect_single(g["img0"].astype(np.float32))
    assert len(r1) == len(r2)
    np.testing.assert_allclose(r1.scores, r2.scores, atol=1e-5)


@needs_reference
def test_detect_stream_is_incremental(production_detector):
    """The streaming wrapper must yield results before consuming the whole
    (potentially unbounded) source, holding at most `prefetch` in flight."""
    from headpose_tpu.runtime.streaming import detect_stream
    g = np.load(os.path.join(GOLDEN, "e2e.npz"))
    b = np.stack([g["img0"][:128, :128]] * 2)
    consumed = []

    def source():
        for i in range(6):
            consumed.append(i)
            yield b

    gen = detect_stream(production_detector, source(), prefetch=2)
    next(gen)
    # after one yield: at most 1 (yielded) + 2 (in flight) + 2 (staged) drawn
    assert len(consumed) <= 5, f"stream over-consumed: {len(consumed)}"
    assert len(list(gen)) == 5


@needs_reference
def test_detect_parity_production_threshold():
    """E2E parity at the PRODUCTION score threshold (0.4) on an adversarially
    synthesized detection-rich image (gradient ascent on the detector score —
    captured from the reference pipeline, tests/golden/e2e_production.npz)."""
    from headpose_tpu.pretrained import flagship_detector
    g = np.load(os.path.join(GOLDEN, "e2e_production.npz"))
    det = flagship_detector()  # default thresholds = production (0.4 / 0.3)
    res = det.detect_single(g["img"])
    assert len(res) == len(g["scores"]) > 0
    np.testing.assert_allclose(res.scores, g["scores"], atol=1e-4)
    np.testing.assert_allclose(res.boxes, g["boxes"], atol=1e-4)
    np.testing.assert_allclose(res.poses, g["poses"], atol=5e-4)


@needs_reference
def test_detector_threshold_mutation_retraces():
    """Mutating detector attributes between calls must take effect (the
    config enters the jitted pipeline as static arguments, not trace-time
    reads off self) — a raised score threshold strictly shrinks the
    detection set."""
    from headpose_tpu.pretrained import flagship_detector
    g = np.load(os.path.join(GOLDEN, "e2e_production.npz"))
    det = flagship_detector()
    n_before = len(det.detect_single(g["img"]))
    assert n_before > 0
    det.score_threshold = 0.999
    n_after = len(det.detect_single(g["img"]))
    assert n_after < n_before


@pytest.mark.heavy  # 28s; chunked >128 path also stress-certified on-chip (best_detector gate)
def test_wide_batch_chunking_exact(production_detector):
    """Batches wider than one 128-lane tile are served as explicit <=128
    branches inside one jit (docs/BENCH.md 'the >128 cliff': four 128-wide
    branches beat the native 512-batch program 6.17 vs 8.21 ms).  The
    chunked program must equal narrow calls bit for bit."""
    g = np.load(os.path.join(GOLDEN, "e2e_production.npz"))
    rng = np.random.default_rng(7)
    img = np.asarray(g["img"], np.uint8)
    batch = np.concatenate([
        np.broadcast_to(img, (100, *img.shape)),
        rng.integers(0, 256, (60, *img.shape)).astype(np.uint8)])
    det = production_detector
    wide = det.detect(batch)                       # 160 -> 128 + 32 branches
    lo, hi = det.detect(batch[:128]), det.detect(batch[128:])
    for k in ("boxes", "keypoints", "scores", "poses", "valid"):
        merged = np.concatenate([np.asarray(getattr(lo, k)),
                                 np.asarray(getattr(hi, k))])
        np.testing.assert_array_equal(np.asarray(getattr(wide, k)), merged,
                                      err_msg=k)


@pytest.mark.heavy  # 26s; 'auto' resolution also exercised by the on-chip certifications
def test_postprocess_auto_backend():
    """'auto' picks the XLA path for small batches and the fused kernel for
    >=64-lane occupancy, per chunk — always bit-equal to the explicit
    backends."""
    from headpose_tpu.pretrained import flagship_detector

    g = np.load(os.path.join(GOLDEN, "e2e_production.npz"))
    img = np.asarray(g["img"], np.uint8)
    auto = flagship_detector(postprocess="auto")
    # compare against BOTH explicit backends (flagship_detector() defaults
    # to 'auto' itself, so comparing against the default would be vacuous)
    explicit = {b: flagship_detector(postprocess=b)
                for b in ("xla", "pallas")}
    for n in (2, 64):
        batch = np.broadcast_to(img, (n, *img.shape)).copy()
        a = auto.detect(batch)
        for name, det in explicit.items():
            b = det.detect(batch)
            for k in ("boxes", "keypoints", "scores", "poses", "valid"):
                np.testing.assert_array_equal(np.asarray(getattr(a, k)),
                                              np.asarray(getattr(b, k)),
                                              err_msg=f"{k}@{n} vs {name}")
    import pytest
    with pytest.raises(ValueError):
        flagship_detector(postprocess="bogus")


def test_batchresults_is_a_pytree_and_trim_single_fetch():
    """BatchResults is documented as the jit-friendly device-side pytree —
    jax.tree.map and jit must compose with it (round-3 review fix)."""
    from headpose_tpu.runtime.results import BatchResults
    br = BatchResults(
        boxes=jnp.zeros((2, 4, 4)), keypoints=jnp.zeros((2, 4, 6, 2)),
        scores=jnp.zeros((2, 4)), poses=jnp.zeros((2, 4, 3)),
        valid=jnp.zeros((2, 4), bool))
    sliced = jax.tree.map(lambda x: x[:1], br)
    assert isinstance(sliced, type(br)) and sliced.boxes.shape == (1, 4, 4)
    out = jax.jit(lambda b: b.scores.sum())(br)
    assert float(out) == 0.0
    assert len(br.trim()) == 2


class TestSurvivorsHeadEval:
    """head_eval='survivors': pose heads run AFTER NMS on the feature
    vectors gathered at survivor cells, instead of over every map cell
    (the reference's grafted-graph semantics, JoinModels.py:65-66)."""

    def test_equals_map_for_per_cell_heads(self, production_detector):
        """All shipped reference heads are per-cell 1x1-conv chains, so the
        two profiles must agree exactly — detections AND poses — on
        detection-rich content, with either postprocess backend."""
        from headpose_tpu.runtime import FaceDetector

        g = np.load(os.path.join(GOLDEN, "e2e_production.npz"))
        rng = np.random.default_rng(3)
        img = np.asarray(g["img"], np.uint8)
        batch = np.concatenate([
            np.broadcast_to(img, (2, *img.shape)),
            rng.integers(0, 256, (2, *img.shape)).astype(np.uint8)])
        det = production_detector
        base = det.detect(batch)
        assert int(np.asarray(base.valid).sum()) > 0
        for backend in ("xla", "pallas"):
            surv = FaceDetector(det.model, det.params,
                                score_threshold=det.score_threshold,
                                postprocess=backend,
                                head_eval="survivors").detect(batch)
            for k in ("boxes", "keypoints", "scores", "valid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(surv, k)),
                    np.asarray(getattr(base, k)), err_msg=f"{k}@{backend}")
            # poses: bit-exact on this platform; allow reassociation ulps
            np.testing.assert_allclose(
                np.asarray(surv.poses), np.asarray(base.poses), atol=1e-4,
                err_msg=f"poses@{backend}")

    def test_flagship_corpus_subset_bit_equal(self, production_detector):
        """Standing CPU version of the on-chip gate (docs/
        headeval_divergence.json: divergence exactly 0 across all 451
        corpus detections): on a detection-rich corpus subset the flagship's
        survivors profile must reproduce the map profile bit for bit."""
        from headpose_tpu.runtime import FaceDetector

        data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
        imgs = np.asarray(data["imgs"][:12], np.uint8)
        det = production_detector
        base = det.detect(imgs)
        surv = FaceDetector(det.model, det.params,
                            score_threshold=det.score_threshold,
                            head_eval="survivors").detect(imgs)
        assert int(np.asarray(base.valid).sum()) >= 10
        for k in ("boxes", "keypoints", "scores", "poses", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(surv, k)),
                                          np.asarray(getattr(base, k)),
                                          err_msg=k)

    def test_spatial_heads_get_training_semantics(self, production_detector):
        """For heads with SPATIAL context (SE gating pools over the whole
        map when grafted), 'survivors' evaluates each face's vector
        independently — the training/dataset semantics every head was
        fit and holdout-scored under (SURVEY.md §2.15).  Verified against
        an independent per-vector evaluation: apply the heads to each
        cell's vector as 2-D rows, then pose-gather through the stock
        map-mode postprocess."""
        from headpose_tpu.models.heads import EnsembleHead, MLPHead, SEMLPHead
        from headpose_tpu.models.unified import UnifiedPoseModel
        from headpose_tpu.ops.detection import postprocess as pp
        from headpose_tpu.ops.image import preprocess
        from headpose_tpu.runtime import FaceDetector

        g = np.load(os.path.join(GOLDEN, "e2e_production.npz"))
        img = np.asarray(g["img"], np.uint8)[None]
        base = production_detector
        h88 = EnsembleHead(members=(
            SEMLPHead(in_features=88, reduction=8, hidden=16),
            MLPHead(in_features=88, layers=((16, "softsign"), (3, "linear")))))
        h96 = SEMLPHead(in_features=96, reduction=8, hidden=16)
        model = UnifiedPoseModel(backbone=base.model.backbone,
                                 head88=h88, head96=h96)
        params = {"backbone": base.params["backbone"],
                  "head88": h88.init(jax.random.PRNGKey(0)),
                  "head96": h96.init(jax.random.PRNGKey(1))}
        kw = dict(score_threshold=base.score_threshold)
        rmap = FaceDetector(model, params, head_eval="map", **kw).detect(img)
        det_auto = FaceDetector(model, params, **kw)  # 'auto' → survivors
        assert det_auto.head_eval == "survivors"      # SE members present
        rsurv = det_auto.detect(img)
        valid = np.asarray(rmap.valid)
        assert int(valid.sum()) >= 2
        # detections identical (the SSD branch is untouched)
        for k in ("boxes", "scores", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(rsurv, k)),
                                          np.asarray(getattr(rmap, k)))
        # independent per-vector expectation
        x = preprocess(jnp.asarray(img), base.input_size, "bgr")
        out = model.apply(params, x, heads=False)
        pvf = h88.apply(params["head88"],
                        out["feat88"].reshape(-1, 88)).reshape(1, 16, 16, 3)
        pvb = h96.apply(params["head96"],
                        out["feat96"].reshape(-1, 96)).reshape(1, 8, 8, 3)
        expected = jax.vmap(lambda s, l, pf, pb: pp(
            s, l, pf, pb, base.anchors,
            score_threshold=base.score_threshold))(
            out["scores"], out["loc"], pvf, pvb)
        np.testing.assert_allclose(np.asarray(rsurv.poses)[valid],
                                   np.asarray(expected["poses"])[valid],
                                   atol=1e-4)
        # and the map profile is genuinely a DIFFERENT function here (the
        # SE gate pooled over the whole map, not this face's vector)
        dmax = np.abs(np.asarray(rsurv.poses)[valid]
                      - np.asarray(rmap.poses)[valid]).max()
        assert dmax > 1e-3, f"expected map/survivors divergence, got {dmax}"

    def test_needs_native_heads(self, production_detector):
        from headpose_tpu.models.unified import UnifiedPoseModel
        from headpose_tpu.runtime import FaceDetector

        with pytest.raises(ValueError, match="survivors"):
            FaceDetector(UnifiedPoseModel(head88=None, head96=None), {},
                         head_eval="survivors")
        with pytest.raises(ValueError, match="head_eval"):
            FaceDetector(UnifiedPoseModel(), {}, head_eval="bogus")
        # head_eval is a mutation-safe static arg, so the guard must also
        # hold on the SERVING path: flipping a headless detector to
        # 'survivors' post-construction fails with the clear message, not
        # a KeyError mid-trace
        base = production_detector
        det = FaceDetector(
            UnifiedPoseModel(backbone=base.model.backbone,
                             head88=None, head96=None),
            {"backbone": base.params["backbone"]})
        assert det.head_eval == "map"
        det.head_eval = "survivors"
        with pytest.raises(ValueError, match="survivors"):
            det.detect(np.zeros((1, 128, 128, 3), np.uint8))

    def test_auto_resolves_by_spatial_context(self, production_detector):
        """head_eval='auto' (the default) picks 'survivors' exactly when a
        head declares spatial_context=True: reference artifacts (per-cell
        chains) keep the bit-identical 'map' program; ensemble artifacts
        with SE-gated members serve their calibrated per-vector semantics
        without the caller knowing the flag; headless models (graph
        adapters) and unknown protocol heads stay on 'map'."""
        from headpose_tpu.models.heads import EnsembleHead, MLPHead, SEMLPHead
        from headpose_tpu.models.unified import UnifiedPoseModel
        from headpose_tpu.runtime import FaceDetector

        base = production_detector
        assert base.head_eval == "map"  # flagship: per-cell heads

        mk = lambda h88, h96: FaceDetector(
            UnifiedPoseModel(backbone=base.model.backbone,
                             head88=h88, head96=h96), {})
        mlp88 = MLPHead(88, ((16, "tanh"), (3, "linear")))
        mlp96 = MLPHead(96, ((16, "tanh"), (3, "linear")))
        assert mk(mlp88, mlp96).head_eval == "map"
        assert mk(mlp88, SEMLPHead(in_features=96)).head_eval == "survivors"
        assert mk(EnsembleHead(members=(mlp88, SEMLPHead(in_features=88))),
                  mlp96).head_eval == "survivors"
        # headless: auto falls back to map (explicit 'survivors' raises)
        assert FaceDetector(UnifiedPoseModel(head88=None, head96=None),
                            {}).head_eval == "map"

        # a protocol head WITHOUT the attribute resolves to 'map'
        class _Plain:
            in_features = 88

            def apply(self, params, x, *, train=False, rng=None):
                return x[..., :3]

        assert mk(_Plain(), mlp96).head_eval == "map"
        # ...but an ensemble CONTAINING it counts as spatial (conservative)
        assert EnsembleHead(members=(_Plain(),)).spatial_context is True
