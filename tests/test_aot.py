"""AOT serving artifacts (tools/aot.py): export the compiled pipeline via
jax.export and replay it without model code.

The contract under test: an ExportedDetector serves row-for-row identical
results to the FaceDetector it was exported from — including arbitrary batch
sizes covered by chunking + tail padding — and every config knob is baked in
(the artifact is self-contained; loading touches only aot.py + BatchResults).
"""
import json
import os

import numpy as np
import pytest

from headpose_tpu.runtime.detector import FaceDetector
from headpose_tpu.tools.aot import (ExportedDetector, export_detector,
                                    load_exported)


def _frames(n, size=128, seed=0):
    # detection-free noise frames exercise the full pipeline (the slab
    # contract is shape-stable regardless of how many faces survive NMS)
    return np.random.default_rng(seed).integers(
        0, 256, (n, size, size, 3), dtype=np.uint8)


@pytest.fixture(scope="module")
def detector(unified_native):
    model, params = unified_native
    return FaceDetector(model, params, score_threshold=0.5)


@pytest.fixture(scope="module")
def artifact(detector, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aot") / "flagship")
    meta = export_detector(detector, path, batch_sizes=(2, 4),
                           platforms=("cpu",))
    return path, meta


class TestExport:
    def test_artifact_layout(self, artifact):
        path, meta = artifact
        assert meta["batch_sizes"] == [2, 4]
        assert meta["platforms"] == ["cpu"]
        assert meta["dtype"] == "uint8"
        assert meta["config"]["precision"] == "highest"
        on_disk = json.load(open(os.path.join(path, "aot.json")))
        assert on_disk == meta
        for entry in meta["programs"].values():
            f = os.path.join(path, entry["file"])
            assert os.path.getsize(f) > 1000
            assert entry["postprocess"] == "xla"  # cpu target never pallas

    def test_exact_match_at_exported_width(self, detector, artifact):
        path, _ = artifact
        aot = load_exported(path)
        frames = _frames(2)
        want = detector.detect(frames)
        got = aot.detect(frames)
        for field in ("boxes", "keypoints", "scores", "poses", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(got, field)),
                                          np.asarray(getattr(want, field)),
                                          err_msg=field)

    def test_chunked_and_padded_batches(self, detector, artifact):
        """Widths NOT exported directly (1, 3, 7) serve via greedy chunking
        + tail padding, row-for-row equal to the source detector."""
        path, _ = artifact
        aot = load_exported(path)
        for b in (1, 3, 7):
            frames = _frames(b, seed=b)
            want = detector.detect(frames)
            got = aot.detect(frames)
            assert got.boxes.shape[0] == b
            for field in ("boxes", "scores", "poses", "valid"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(got, field)),
                    np.asarray(getattr(want, field)),
                    err_msg=f"batch {b}: {field}")

    def test_chunk_plan_greedy(self, artifact):
        aot = load_exported(artifact[0])
        assert aot._chunks(1) == [2]
        assert aot._chunks(4) == [4]
        assert aot._chunks(5) == [4, 2]
        assert aot._chunks(11) == [4, 4, 4]

    def test_single_image_rank3(self, detector, artifact):
        aot = load_exported(artifact[0])
        frame = _frames(1)[0]
        got = aot.detect(frame)
        want = detector.detect(frame)
        np.testing.assert_array_equal(np.asarray(got.valid),
                                      np.asarray(want.valid))


class TestSurvivorsExport:
    def test_ensemble_survivors_profile_round_trips(self, detector, tmp_path):
        """head_eval='survivors' (SE-gated ensemble heads evaluated on each
        survivor's feature VECTOR after NMS — the semantics such heads were
        calibrated under, docs/headeval_divergence.json) is a baked serving
        config like every other knob: the exported program must reproduce
        the source detector bit for bit, not silently fall back to the
        map-grafted function (which genuinely differs for these heads)."""
        import jax

        from headpose_tpu.models.heads import (EnsembleHead, MLPHead,
                                               SEMLPHead)
        from headpose_tpu.models.unified import UnifiedPoseModel

        base = detector
        h88 = EnsembleHead(members=(
            SEMLPHead(in_features=88, reduction=8, hidden=16),
            MLPHead(in_features=88,
                    layers=((16, "softsign"), (3, "linear")))))
        h96 = SEMLPHead(in_features=96, reduction=8, hidden=16)
        model = UnifiedPoseModel(backbone=base.model.backbone,
                                 head88=h88, head96=h96)
        params = {"backbone": base.params["backbone"],
                  "head88": h88.init(jax.random.PRNGKey(0)),
                  "head96": h96.init(jax.random.PRNGKey(1))}
        src = FaceDetector(model, params,
                           score_threshold=base.score_threshold)
        assert src.head_eval == "survivors"  # 'auto': SE members present

        golden = os.path.join(os.path.dirname(__file__), "golden",
                              "e2e_production.npz")
        img = np.asarray(np.load(golden)["img"], np.uint8)
        frames = np.stack([img, np.zeros_like(img)])

        path = str(tmp_path / "survivors")
        meta = export_detector(src, path, batch_sizes=(2,),
                               image_shape=img.shape[:2],
                               platforms=("cpu",))
        assert meta["config"]["head_eval"] == "survivors"
        got = load_exported(path).detect(frames)
        want = src.detect(frames)
        valid = np.asarray(want.valid)
        assert int(valid.sum()) > 0
        for field in ("boxes", "keypoints", "scores", "poses", "valid"):
            np.testing.assert_array_equal(np.asarray(getattr(got, field)),
                                          np.asarray(getattr(want, field)),
                                          err_msg=field)
        # the baked profile is genuinely the per-vector function: the map
        # profile of the SAME weights diverges on these SE-gated heads
        rmap = FaceDetector(model, params,
                            score_threshold=base.score_threshold,
                            head_eval="map").detect(frames)
        dmax = np.abs(np.asarray(got.poses)[valid]
                      - np.asarray(rmap.poses)[valid]).max()
        assert dmax > 1e-3, f"expected map/survivors divergence, got {dmax}"


def test_loader_imports_no_model_code():
    """The deployment claim, literally: a serving host importing the AOT
    loader pulls in NONE of the model/compiler/training stack (the package
    __init__s are lazy, PEP 562)."""
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import headpose_tpu.tools.aot\n"
        "heavy = [m for m in sys.modules if m.startswith('headpose_tpu.')\n"
        "         and m.split('.')[1] in ('models', 'core', 'ops', 'train',\n"
        "                                 'data', 'parallel', 'compat',\n"
        "                                 'pretrained')]\n"
        "assert not heavy, heavy\n"
        "assert 'headpose_tpu.runtime.detector' not in sys.modules\n")
    subprocess.run([sys.executable, "-c", code], check=True, timeout=120)


class TestServing:
    def test_dynamic_batcher_over_exported(self, detector, artifact):
        """A model-code-free serving host: AOT artifact + DynamicBatcher.
        Concurrent single-frame clients get results identical to direct
        detection on the source detector."""
        from headpose_tpu.runtime.server import DynamicBatcher

        aot = load_exported(artifact[0])
        frames = _frames(5, seed=42)
        want = detector.detect(frames).trim()
        with DynamicBatcher(aot, max_batch=4, max_delay=0.05) as srv:
            futs = [srv.submit(f) for f in frames]
            got = [f.result(timeout=120) for f in futs]
        assert srv.frames_served == 5
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g.poses),
                                          np.asarray(w.poses))
            np.testing.assert_array_equal(np.asarray(g.boxes),
                                          np.asarray(w.boxes))

    def test_pose_server_over_exported(self, detector, artifact):
        """The full deployment stack: AOT artifact behind the HTTP endpoint.
        Network clients get the source detector's answers from a host with
        no model code on the import path (runtime.http -> server -> aot)."""
        import io
        import json
        import urllib.request

        from headpose_tpu.runtime import PoseServer

        aot = load_exported(artifact[0])
        frames = _frames(3, seed=43)
        want = detector.detect(frames).trim()
        with PoseServer(aot, port=0, max_batch=4, max_delay=0.05) as srv:
            for frame, w in zip(frames, want):
                buf = io.BytesIO()
                np.save(buf, frame)
                req = urllib.request.Request(f"{srv.url}/v1/detect",
                                             data=buf.getvalue(),
                                             method="POST")
                with urllib.request.urlopen(req, timeout=120) as resp:
                    got = json.load(resp)
                assert got["count"] == len(w)
                for k, face in enumerate(got["faces"]):
                    np.testing.assert_allclose(face["pose"], w.poses[k],
                                               rtol=1e-5, atol=1e-5)


    def test_http_cli_builder_resolves_aot_artifacts(self, artifact):
        """runtime.http's --model accepts an AOT artifact directory (the
        no-model-code serving host), and refuses conflicting flags rather
        than silently ignoring config that is baked into the programs."""
        from headpose_tpu.runtime.http import _build_detector
        from headpose_tpu.tools.aot import ExportedDetector

        det = _build_detector(artifact[0], precision="highest",
                              head_eval="auto")
        assert isinstance(det, ExportedDetector)
        with pytest.raises(ValueError, match="baked in"):
            _build_detector(artifact[0], precision="turbo", head_eval="auto")


class TestValidation:
    def test_rejects_wrong_dtype(self, artifact):
        aot = load_exported(artifact[0])
        with pytest.raises(ValueError, match="uint8"):
            aot.detect(np.zeros((2, 128, 128, 3), np.float32))

    def test_rejects_wrong_resolution(self, artifact):
        aot = load_exported(artifact[0])
        with pytest.raises(ValueError, match="Re-export"):
            aot.detect(_frames(2, size=64))

    def test_rejects_mesh_detector(self, detector, tmp_path):
        import jax
        from headpose_tpu.parallel import create_mesh

        mesh = create_mesh(min(2, jax.device_count()))
        det = FaceDetector(detector.model, detector.params, mesh=mesh)
        with pytest.raises(ValueError, match="mesh"):
            export_detector(det, str(tmp_path / "x"), batch_sizes=(2,),
                            platforms=("cpu",))

    def test_rejects_pallas_for_cpu_target(self, detector, tmp_path):
        det = FaceDetector(detector.model, detector.params,
                           postprocess="pallas")
        with pytest.raises(ValueError, match="TPU"):
            export_detector(det, str(tmp_path / "x"), batch_sizes=(2,),
                            platforms=("cpu",))

    def test_auto_resolves_xla_off_tpu(self, detector, artifact):
        # postprocess='auto' + cpu platform must pin 'xla' even at >=64 lanes
        from headpose_tpu.tools.aot import _resolve_backend

        assert _resolve_backend(detector, 128, ("cpu",)) == "xla"
        assert _resolve_backend(detector, 128, ("tpu", "cpu")) == "xla"

    def test_rejects_bad_batch_sizes(self, detector, tmp_path):
        with pytest.raises(ValueError, match="positive"):
            export_detector(detector, str(tmp_path / "x"), batch_sizes=(0,),
                            platforms=("cpu",))

    def test_empty_batch_returns_empty_slabs(self, artifact):
        aot = load_exported(artifact[0])
        res = aot.detect(np.zeros((0, 128, 128, 3), np.uint8))
        assert res.boxes.shape == (0, aot.meta["max_faces"], 4)
        assert res.valid.shape[0] == 0 and res.trim() == []

    def test_rejects_bad_rank(self, artifact):
        aot = load_exported(artifact[0])
        with pytest.raises(ValueError, match=r"\(B, H, W, 3\)"):
            aot.detect(np.zeros((128, 128), np.uint8))

    def test_rejects_future_format(self, artifact, tmp_path):
        import shutil

        path = str(tmp_path / "fut")
        shutil.copytree(artifact[0], path)
        meta = json.load(open(os.path.join(path, "aot.json")))
        meta["format_version"] = 99
        json.dump(meta, open(os.path.join(path, "aot.json"), "w"))
        with pytest.raises(ValueError, match="format_version"):
            ExportedDetector(path)

    def test_records_and_pins_producer_versions(self, artifact, tmp_path,
                                                monkeypatch):
        """The manifest records the producing jax + export calling-convention
        versions, and a load-side skew fails LOUDLY with both versions in
        the message (VERDICT r3 item 8) instead of whatever the raw
        deserializer would raise."""
        import shutil

        import jax

        path, meta = artifact
        ver = meta["versions"]
        assert ver["jax"] == jax.__version__
        lo = jax.export.minimum_supported_calling_convention_version
        hi = jax.export.maximum_supported_calling_convention_version
        assert lo <= ver["export_calling_convention"] <= hi
        # artifact with a convention this host does not support
        skew = str(tmp_path / "skew")
        shutil.copytree(path, skew)
        m = json.load(open(os.path.join(skew, "aot.json")))
        m["versions"]["export_calling_convention"] = hi + 1
        m["versions"]["jax"] = "99.0.0"
        json.dump(m, open(os.path.join(skew, "aot.json"), "w"))
        with pytest.raises(ValueError, match=r"99\.0\.0.*supports versions"):
            ExportedDetector(skew)
        # a convention INSIDE the window but an undeserializable payload
        # still names the producing versions
        bad = str(tmp_path / "bad")
        shutil.copytree(path, bad)
        fname = meta["programs"]["2"]["file"]
        with open(os.path.join(bad, fname), "wb") as f:
            f.write(b"not an exported program")
        det = ExportedDetector(bad)
        with pytest.raises(RuntimeError, match="exported by jax"):
            det.detect(_frames(2))


def test_best_model_exports_and_serves_aot(tmp_path):
    """The served best model ('unified-best-distilled') rides the AOT
    deployment path: export → load on a model-code-free path → detect
    matches the source detector exactly.  With the ensembles this needed
    the survivors-profile export; the distilled heads make the plain path
    sufficient (VERDICT r3 item 1: frontier accuracy in every deployment
    format)."""
    from headpose_tpu.pretrained import best_detector

    det = best_detector(score_threshold=0.5)
    path = str(tmp_path / "best")
    meta = export_detector(det, path, batch_sizes=(2,), platforms=("cpu",))
    assert meta["config"]["head_eval"] == "map"  # 'auto' resolved: plain
    # per-vector MLP heads take the exact map-graft path
    aot = load_exported(path)
    frames = _frames(2)
    want = det.detect(frames)
    got = aot.detect(frames)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(want.valid))
    np.testing.assert_array_equal(np.asarray(got.poses),
                                  np.asarray(want.poses))
    np.testing.assert_array_equal(np.asarray(got.boxes),
                                  np.asarray(want.boxes))
