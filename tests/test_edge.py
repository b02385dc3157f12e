"""Native edge postprocess (native/postprocess.cpp via runtime/edge.py).

The C++ library is the host half of the edge deployment (TFLite artifact +
native postprocess, no JAX in the loop); its contract is exact parity with
ops/detection.py::postprocess — which is itself golden-verified against the
reference pipeline.  Fuzzed on adversarial inputs, then driven end-to-end
as EdgeDetector against the JAX FaceDetector on parity-corpus images.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headpose_tpu.models.anchors import FRONT_CONFIG, generate_anchors
from headpose_tpu.ops.detection import postprocess
from headpose_tpu.runtime.edge import NativePostprocess, native_available

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

pytestmark = [
    pytest.mark.skipif(not native_available(),
                       reason="g++ unavailable on this host"),
    # TFLite/tf-keras round-trips + a subprocess run: the heavy lane
    pytest.mark.heavy,
]

ANCHORS = np.asarray(generate_anchors(FRONT_CONFIG), np.float32)


def _jax_post(logits, loc, pf, pb, **kw):
    fn = jax.jit(jax.vmap(lambda s, l, a, b: postprocess(
        s, l, a, b, jnp.asarray(ANCHORS), **kw)))
    return jax.tree.map(np.asarray, fn(jnp.asarray(logits), jnp.asarray(loc),
                                       jnp.asarray(pf), jnp.asarray(pb)))


def _assert_matches_jax(native_results, jax_out):
    for i, res in enumerate(native_results):
        count = int(jax_out["valid"][i].sum())
        assert len(res) == count, f"image {i}: count {len(res)} != {count}"
        c = count
        np.testing.assert_array_equal(res.boxes, jax_out["boxes"][i, :c])
        np.testing.assert_array_equal(res.keypoints,
                                      jax_out["keypoints"][i, :c])
        np.testing.assert_array_equal(res.poses, jax_out["poses"][i, :c])
        np.testing.assert_allclose(res.scores, jax_out["scores"][i, :c],
                                   rtol=0, atol=2e-7)  # sigmoid ulp


class TestNativePostprocessParity:
    def test_fuzz_random_inputs(self):
        """200 random images (varying detection density) decode, NMS, and
        pose-gather bit-identically to the JAX postprocess."""
        rng = np.random.default_rng(0)
        B = 200
        logits = rng.normal(-3.0, 2.5, (B, 896)).astype(np.float32)
        loc = rng.normal(0.0, 20.0, (B, 896, 16)).astype(np.float32)
        pf = rng.normal(0, 30, (B, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 30, (B, 8, 8, 3)).astype(np.float32)
        native = NativePostprocess(ANCHORS)
        got = native(logits, loc, pf, pb)
        want = _jax_post(logits, loc, pf, pb)
        assert sum(len(r) for r in got) > 100  # the fuzz actually detects
        _assert_matches_jax(got, want)

    def test_nonfinite_and_ties(self):
        """nan/inf logits, non-finite loc, and exactly-tied scores follow
        the JAX sanitization + first-index tie-break."""
        rng = np.random.default_rng(1)
        B = 8
        logits = rng.normal(0.0, 1.0, (B, 896)).astype(np.float32)
        logits[0, :10] = np.nan
        logits[1, 5] = np.inf
        logits[2, :] = -np.inf
        logits[3, 100] = logits[3, 200] = 4.0   # tie: lower index wins
        loc = rng.normal(0.0, 10.0, (B, 896, 16)).astype(np.float32)
        loc[1, 5, :4] = [np.nan, np.inf, -np.inf, np.nan]
        pf = rng.normal(0, 5, (B, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 5, (B, 8, 8, 3)).astype(np.float32)
        native = NativePostprocess(ANCHORS)
        _assert_matches_jax(native(logits, loc, pf, pb),
                            _jax_post(logits, loc, pf, pb))

    def test_threshold_endpoints_and_empty(self):
        """score_threshold <= 0 reproduces the reference's strict prob > 0
        filter; a high threshold yields clean empties."""
        rng = np.random.default_rng(2)
        logits = rng.normal(-1.0, 1.0, (4, 896)).astype(np.float32)
        logits[0, 7] = -200.0                  # sigmoid underflows to 0.0
        # plant logits AT the f32 cutoffs for t=0.0135 — the threshold the
        # c_float-narrowing bug flipped by one ulp (score_threshold must
        # cross the ctypes boundary as double)
        cut = np.float32(np.log(0.0135 / (1 - 0.0135)))
        logits[1, 50] = cut                       # == cutoff: dropped
        logits[1, 51] = np.nextafter(cut, np.float32(np.inf))  # kept
        loc = rng.normal(0.0, 10.0, (4, 896, 16)).astype(np.float32)
        pf = np.zeros((4, 16, 16, 3), np.float32)
        pb = np.zeros((4, 8, 8, 3), np.float32)
        for t in (0.0, 0.0135, 0.999999):
            native = NativePostprocess(ANCHORS, score_threshold=t)
            _assert_matches_jax(native(logits, loc, pf, pb),
                                _jax_post(logits, loc, pf, pb,
                                          score_threshold=t))

    def test_max_faces_cap(self):
        """Crowded frames stop at max_faces, same selection order."""
        rng = np.random.default_rng(3)
        logits = rng.normal(3.0, 0.5, (2, 896)).astype(np.float32)
        loc = rng.normal(0.0, 40.0, (2, 896, 16)).astype(np.float32)
        pf = rng.normal(0, 5, (2, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 5, (2, 8, 8, 3)).astype(np.float32)
        native = NativePostprocess(ANCHORS, max_faces=7)
        got = native(logits, loc, pf, pb)
        want = _jax_post(logits, loc, pf, pb, max_faces=7)
        assert all(len(r) == 7 for r in got)
        _assert_matches_jax(got, want)

    def test_max_face_num_overflow_truncation(self):
        """The production MAX_FACE_NUM=100 cap with >100 mutually-surviving
        candidates: the C++ greedy must truncate with the reference's exact
        survivor identity AND emission order (CPU twin of the on-chip
        overflow certification, blazeFaceDetectorH5.py:8-9,332)."""
        rng = np.random.default_rng(11)
        # 12px boxes pinned at every anchor center: front same-cell pairs
        # coincide (one survives per cell), everything else sits below the
        # 0.3 IoU boundary -> ~320 mutually-surviving candidates
        logits = rng.uniform(1.0, 3.0, (2, 896)).astype(np.float32)
        loc = np.zeros((2, 896, 16), np.float32)
        loc[..., 2:4] = 12.0
        pf = rng.normal(0, 5, (2, 16, 16, 3)).astype(np.float32)
        pb = rng.normal(0, 5, (2, 8, 8, 3)).astype(np.float32)
        uncapped = _jax_post(logits, loc, pf, pb, max_faces=896)
        assert (uncapped["valid"].sum(1) > 100).all(), \
            "construction must yield >100 mutually-surviving candidates"
        native = NativePostprocess(ANCHORS, max_faces=100)
        got = native(logits, loc, pf, pb)
        want = _jax_post(logits, loc, pf, pb, max_faces=100)
        assert all(len(r) == 100 for r in got)     # cap genuinely bit
        _assert_matches_jax(got, want)             # identity AND order
        # the capped output is exactly the uncapped greedy's first 100
        np.testing.assert_array_equal(want["boxes"][:, :100],
                                      uncapped["boxes"][:, :100])

    def test_layout_rejected(self):
        native = NativePostprocess(ANCHORS)
        with pytest.raises(ValueError, match="layout|\\(B, A"):
            native(np.zeros((1, 896), np.float32),
                   np.zeros((1, 896, 16), np.float32),
                   np.zeros((1, 4, 4, 3), np.float32),   # wrong grid
                   np.zeros((1, 8, 8, 3), np.float32))

    def test_corpus_model_outputs(self, unified_native):
        """Real flagship outputs on parity-corpus images postprocess
        bit-identically to the JAX path at production settings."""
        from headpose_tpu.ops.image import preprocess

        model, params = unified_native
        data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
        imgs = data["imgs"][:16]
        with jax.default_matmul_precision("highest"):
            outs = jax.jit(model.reference_outputs)(
                params, jax.jit(preprocess)(imgs))
        cls_f, cls_b, loc_f, loc_b, pf, pb = [np.asarray(o) for o in outs]
        logits = np.concatenate([cls_f[:, :, 0], cls_b[:, :, 0]], axis=1)
        loc = np.concatenate([loc_f, loc_b], axis=1)
        native = NativePostprocess(ANCHORS)
        got = native(logits, loc, pf, pb)
        want = _jax_post(logits, loc, pf, pb)
        assert sum(len(r) for r in got) >= 16
        _assert_matches_jax(got, want)


_NO_JAX_SCRIPT = """\
import os, sys

sys.path.insert(0, {repo!r})
assert "jax" not in sys.modules, "jax leaked in before the blocker"


class _BlockJax:
    # simulated jax-free host: any jax/jaxlib import fails loudly
    def find_spec(self, name, path=None, target=None):
        if name.split(".")[0] in ("jax", "jaxlib"):
            raise ImportError(f"{{name}} blocked: simulated jax-free host")
        return None


sys.meta_path.insert(0, _BlockJax())

import numpy as np

from headpose_tpu.runtime.edge import EdgeDetector
from headpose_tpu.runtime.http import PoseServer
from headpose_tpu.runtime.client import PoseClient

io = np.load({io_path!r})
edge = EdgeDetector({artifact!r}, score_threshold=0.05)

# single-frame contract, bit-exact vs the jax-ful parent's edge pipeline
got = edge.detect_single(io["imgs"][0])
np.testing.assert_array_equal(got.boxes, io["boxes"])
np.testing.assert_array_equal(got.poses, io["poses"])
np.testing.assert_array_equal(got.scores, io["scores"])

# batched contract: numpy BatchResults round-trips through trim()
batch = edge.detect(io["imgs"])
trimmed = batch.trim()
assert len(trimmed) == 2 and len(trimmed[0]) == len(got)
np.testing.assert_array_equal(trimmed[0].poses, got.poses)

# the serving stack composes: PoseServer + PoseClient round trip
want1 = edge.detect_single(io["imgs"][1])
with PoseServer(edge, port=0, max_batch=4) as srv:
    with PoseClient(srv.url) as client:
        res = client.detect(io["imgs"][1])
        np.testing.assert_array_equal(res.poses, want1.poses)

assert "jax" not in sys.modules, "something imported jax behind the blocker"
print("OK")
"""


def test_edge_serving_without_jax(tmp_path, unified_native):
    """DEPLOY.md's no-JAX claim, literally: a subprocess with jax
    import-BLOCKED (raising finder ahead of sys.meta_path) builds
    EdgeDetector from the artifact, detects bit-identically to the jax-ful
    parent's edge pipeline, and answers a PoseClient round trip through
    PoseServer."""
    import subprocess
    import sys

    pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    from headpose_tpu.runtime.edge import EdgeDetector
    from headpose_tpu.tools.tflite import export_unified_tflite

    model, params = unified_native
    artifact = str(tmp_path / "flagship.tflite")
    export_unified_tflite(model, params, artifact)
    data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
    imgs = data["imgs"][:2]
    want = EdgeDetector(artifact, score_threshold=0.05).detect_single(imgs[0])
    assert len(want) > 0
    io_path = str(tmp_path / "io.npz")
    np.savez(io_path, imgs=imgs, boxes=want.boxes, poses=want.poses,
             scores=want.scores)
    script = tmp_path / "no_jax_host.py"
    script.write_text(_NO_JAX_SCRIPT.format(
        repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        io_path=io_path, artifact=artifact))
    env = dict(os.environ)
    # without this, the axon sitecustomize imports jax at interpreter start
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # belt-and-braces for hosts whose sitecustomize imports jax
    # unconditionally: drop any axon site dir from the CHILD's search path
    # (the parent's PYTHONPATH is untouched)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    proc = subprocess.run([sys.executable, str(script)], env=env,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout


class TestEdgeDetector:
    def test_back_camera_edge_pipeline(self, tmp_path):
        """The 256-input back topology (INPUT_BACK — the resolution the
        reference reserves but never ships) exports to TFLite and the edge
        pipeline matches the JAX detector on it, exercising the BACK anchor
        table and 1/256 decode scale."""
        pytest.importorskip("tensorflow")
        pytest.importorskip("tf_keras")
        from headpose_tpu.pretrained import load_pretrained
        from headpose_tpu.runtime.detector import FaceDetector
        from headpose_tpu.runtime.edge import EdgeDetector
        from headpose_tpu.tools.tflite import export_unified_tflite

        model, params = load_pretrained("unified-back-distilled")
        path = str(tmp_path / "back.tflite")
        export_unified_tflite(model, params, path)
        frame = np.random.default_rng(0).integers(
            0, 255, (256, 256, 3), np.uint8)
        want = FaceDetector(model, params,
                            score_threshold=0.05).detect(frame[None]).trim()[0]
        edge = EdgeDetector(path, score_threshold=0.05)
        assert edge.input_size == 256  # auto-detected from the artifact
        with pytest.raises(ValueError, match="baked"):
            EdgeDetector(path, input_size=128)
        got = edge.detect_single(frame)
        assert len(got) == len(want) and len(got) > 0
        np.testing.assert_allclose(got.boxes, want.boxes, rtol=0, atol=1e-4)
        np.testing.assert_allclose(got.poses, want.poses, rtol=0, atol=5e-4)

    def test_serves_through_pose_server(self, tmp_path, unified_native,
                                        production_detector):
        """The whole serving stack composes over the edge pipeline: a
        PoseServer fronting an EdgeDetector is a CPU-only detection service
        (no JAX past construction), answering PoseClient round trips with
        the detector's own results — and the artifact's baked frame shape
        pins the server automatically."""
        pytest.importorskip("tensorflow")
        pytest.importorskip("tf_keras")
        from headpose_tpu.runtime import EdgeDetector, PoseClient, PoseServer
        from headpose_tpu.tools.tflite import export_unified_tflite

        model, params = unified_native
        path = str(tmp_path / "flagship.tflite")
        export_unified_tflite(model, params, path)
        edge = EdgeDetector(path, score_threshold=0.05)
        data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
        want = production_detector.detect(data["imgs"][:2]).trim()
        with PoseServer(edge, port=0, max_batch=4) as srv:
            assert srv.batcher.frame_shape == (128, 128, 3)  # baked pin
            with PoseClient(srv.url) as client:
                for i in range(2):
                    got = client.detect(data["imgs"][i])
                    assert len(got) == len(want[i])
                    np.testing.assert_allclose(got.poses, want[i].poses,
                                               rtol=0, atol=5e-4)

    def test_demo_over_tflite(self, tmp_path, unified_native, monkeypatch):
        """The reference's application surface (the camera loop,
        blazeFaceDetectorH5.py:366-449) runs over the edge pipeline: demo
        --tflite detects in the TFLite interpreter + C++ postprocess (the
        demo resizes camera frames to the artifact's baked size) while
        smoothing/tracking/drawing stay the same code."""
        cv2 = pytest.importorskip("cv2")
        pytest.importorskip("tensorflow")
        pytest.importorskip("tf_keras")
        from headpose_tpu.runtime.demo import run_demo
        from headpose_tpu.tools.tflite import export_unified_tflite

        model, params = unified_native
        path = str(tmp_path / "flagship.tflite")
        export_unified_tflite(model, params, path)
        video = str(tmp_path / "in.mp4")
        # 160x160 frames: the demo's bicubic resize to the baked 128 runs
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                            (160, 160))
        rng = np.random.default_rng(3)
        for _ in range(3):
            w.write(rng.integers(0, 256, (160, 160, 3)).astype(np.uint8))
        w.release()
        monkeypatch.chdir(tmp_path)
        assert run_demo(tflite=path, source=video, display=False,
                        max_frames=2) == 2
        with pytest.raises(ValueError, match="artifact"):
            run_demo(tflite=path, source=video, display=False,
                     precision="turbo")
        with pytest.raises(ValueError, match="exclusive"):
            run_demo(tflite=path, server="http://nope", source=video,
                     display=False)

    def test_end_to_end_matches_facedetector(self, tmp_path, unified_native,
                                             production_detector):
        """The full no-JAX pipeline (TFLite invoke + native postprocess)
        reproduces FaceDetector.detect on corpus images — counts identical,
        numerics within the TFLite forward's certified error."""
        pytest.importorskip("tensorflow")
        pytest.importorskip("tf_keras")
        from headpose_tpu.runtime.edge import EdgeDetector
        from headpose_tpu.tools.tflite import export_unified_tflite

        model, params = unified_native
        path = str(tmp_path / "flagship.tflite")
        export_unified_tflite(model, params, path)
        # production_detector serves at threshold 0.05 (the golden-capture
        # setting) — match it
        edge = EdgeDetector(path, score_threshold=0.05)
        data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
        imgs = data["imgs"][:6]
        want = production_detector.detect(imgs).trim()
        for i in range(len(imgs)):
            got = edge.detect_single(imgs[i])
            assert len(got) == len(want[i])
            np.testing.assert_allclose(got.boxes, want[i].boxes,
                                       rtol=0, atol=1e-4)
            np.testing.assert_allclose(got.poses, want[i].poses,
                                       rtol=0, atol=5e-4)
            np.testing.assert_allclose(got.scores, want[i].scores,
                                       rtol=0, atol=1e-4)

    def test_camera_sized_frames_match_facedetector(self, tmp_path,
                                                    unified_native,
                                                    production_detector):
        """Camera-sized frames are a first-class EdgeDetector input: the
        numpy TF-exact bicubic (ops/bicubic.py — same interpolation
        matrices as the JAX GEMM path) owns the resize, so the no-JAX
        pipeline reproduces FaceDetector.detect from 480x480 and 333x333
        (off-grid phase) frames, not just at the baked 128."""
        pytest.importorskip("tensorflow")
        pytest.importorskip("tf_keras")
        from headpose_tpu.runtime.edge import EdgeDetector
        from headpose_tpu.tools.tflite import export_unified_tflite

        model, params = unified_native
        path = str(tmp_path / "flagship.tflite")
        export_unified_tflite(model, params, path)
        edge = EdgeDetector(path, score_threshold=0.05)
        data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
        for size in (480, 333):
            # nearest-neighbour upscale synthesizes the camera frame; BOTH
            # pipelines then own the downsize back to 128
            up = np.repeat(np.repeat(data["imgs"][:3], 4, axis=1), 4, axis=2)
            up = up[:, :size, :size]
            want = production_detector.detect(up).trim()
            assert sum(len(w) for w in want) > 0
            for i in range(len(up)):
                got = edge.detect_single(up[i])
                assert len(got) == len(want[i])
                np.testing.assert_allclose(got.boxes, want[i].boxes,
                                           rtol=0, atol=1e-4)
                np.testing.assert_allclose(got.poses, want[i].poses,
                                           rtol=0, atol=5e-4)

    def test_nonimage_frame_rejected(self):
        from headpose_tpu.runtime.edge import EdgeDetector

        with pytest.raises(ValueError, match="\\(H, W, 3\\)"):
            EdgeDetector.__new__(EdgeDetector)._preprocess(
                np.zeros((128, 128), np.uint8))

    def test_nonsquare_frames_match_facedetector(self, tmp_path,
                                                 unified_native,
                                                 production_detector):
        """Non-square frames are legal on both pipelines (the reference's
        detectFaces resizes whatever it is given, distorting aspect —
        blazeFaceDetectorH5.py:254-256): the edge pipeline must reproduce
        the JAX detector on a 480x640 frame."""
        pytest.importorskip("tensorflow")
        pytest.importorskip("tf_keras")
        from headpose_tpu.runtime.edge import EdgeDetector
        from headpose_tpu.tools.tflite import export_unified_tflite

        model, params = unified_native
        path = str(tmp_path / "flagship.tflite")
        export_unified_tflite(model, params, path)
        edge = EdgeDetector(path, score_threshold=0.05)
        data = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))
        up = np.repeat(np.repeat(data["imgs"][:2], 4, axis=1), 5, axis=2)
        assert up.shape[1:] == (512, 640, 3)
        frames = up[:, :480]
        want = production_detector.detect(frames).trim()
        assert sum(len(w) for w in want) > 0
        for i in range(len(frames)):
            got = edge.detect_single(frames[i])
            assert len(got) == len(want[i])
            np.testing.assert_allclose(got.boxes, want[i].boxes,
                                       rtol=0, atol=1e-4)
            np.testing.assert_allclose(got.poses, want[i].poses,
                                       rtol=0, atol=5e-4)
