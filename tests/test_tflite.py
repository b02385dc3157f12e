"""TFLite export tests (tools/tflite.py).

The reference's detector descends from MediaPipe BlazeFace, whose canonical
deployment format is .tflite; these tests prove the loop closes from this
framework's side — native heads, native unified models, and reference-format
H5 artifacts all convert to flatbuffers whose serving_default signature
reproduces the JAX forward (validation gate inside every export, the
reference's own InputShapeConvertor.py:129-218 idiom).
"""
import os

import jax
import numpy as np
import pytest

pytest.importorskip("tensorflow")
pytest.importorskip("tf_keras")

from headpose_tpu.models import heads as H
from headpose_tpu.tools.tflite import (UNIFIED_OUTPUT_NAMES, TFLiteModel,
                                       export_h5_tflite, export_head_tflite,
                                       export_unified_tflite)

from conftest import REFERENCE_ROOT, has_reference
pytestmark = pytest.mark.heavy  # tf-keras/TFLite round-trips: the heavy lane (CLAUDE.md test tiers)


HRCHR = os.path.join(
    REFERENCE_ROOT,
    "Model-96/Trained-Models-96-ReshapedInput-NoFlatten/hrchr82r.h5")


class TestHeadExport:
    def test_mlp_head_round_trips(self, tmp_path):
        """The production-style MLP chain converts and the signature runner
        reproduces spec.apply on fresh inputs (not just the validation
        draw)."""
        spec = H.MLPHead(96, ((32, "tanh"), (16, "tanh"), (3, "linear")))
        params = spec.init(jax.random.PRNGKey(0))
        out = str(tmp_path / "head.tflite")
        report = export_head_tflite(spec, params, out)
        assert report["maxerr"] <= 1e-5 and report["bytes"] > 0
        tm = TFLiteModel(out)
        assert tm.input_names == ["features"]
        assert tm.output_names == ["pose"]
        x = np.random.default_rng(3).normal(size=(1, 1, 1, 96)).astype(
            np.float32)
        got = tm(features=x)["pose"]
        np.testing.assert_allclose(got, np.asarray(spec.apply(params, x)),
                                   rtol=1e-5, atol=1e-5)

    def test_se_transformer_converts(self, tmp_path):
        """The attention family (MHA + LayerNorm + SE gating — the graph
        most likely to trip a converter) exports at a map input shape."""
        spec = H.SETransformerHead(88)
        params = spec.init(jax.random.PRNGKey(1))
        report = export_head_tflite(spec, params,
                                    str(tmp_path / "set.tflite"),
                                    input_shape=(1, 4, 4, 88))
        assert report["maxerr"] <= 1e-5
        assert report["input_shape"] == (1, 4, 4, 88)

    def test_stacked_ensemble_exports_per_face(self, tmp_path):
        """The spatial-head refusal in export_unified_tflite points users at
        exactly this: the SE-gated stacked ensemble exports as a per-face
        artifact — input (1, 1, 1, C) IS the per-vector function the stack
        was calibrated on — so the suggested alternative must keep working."""
        from headpose_tpu.pretrained import load_pretrained

        spec, params = load_pretrained("ensemble96-stacked")
        report = export_head_tflite(spec, params,
                                    str(tmp_path / "ens.tflite"))
        assert report["maxerr"] <= 5e-5
        assert report["input_shape"] == (1, 1, 1, 96)

    def test_validation_gate_fails_loud(self, tmp_path):
        """A converted artifact that diverges from the JAX forward must not
        be written: sabotage the comparison tolerance to prove the gate is
        live."""
        spec = H.MLPHead(8, ((3, "linear"),))
        params = spec.init(jax.random.PRNGKey(0))
        out = str(tmp_path / "bad.tflite")
        with pytest.raises(ValueError, match="diverges"):
            export_head_tflite(spec, params, out, atol=-1.0)
        assert not os.path.exists(out)


class TestUnifiedExport:
    def test_flagship_six_output_contract(self, tmp_path, unified_native):
        """The flagship exports with the reference's 6 named outputs
        (JoinModels.py:152-158) and every output tracks the native forward
        within the importer's own golden budget (2e-4)."""
        model, params = unified_native
        out = str(tmp_path / "flagship.tflite")
        report = export_unified_tflite(model, params, out)
        assert set(report["maxerr"]) == set(UNIFIED_OUTPUT_NAMES)
        assert max(report["maxerr"].values()) <= 2e-4
        tm = TFLiteModel(out)
        assert tm.input_names == ["image"]
        assert sorted(tm.output_names) == sorted(UNIFIED_OUTPUT_NAMES)
        x = np.random.default_rng(5).uniform(
            -1, 1, (1, 128, 128, 3)).astype(np.float32)
        got = tm(image=x)
        with jax.default_matmul_precision("highest"):
            want = dict(zip(UNIFIED_OUTPUT_NAMES,
                            model.reference_outputs(params, x)))
        for name in UNIFIED_OUTPUT_NAMES:
            np.testing.assert_allclose(got[name], np.asarray(want[name]),
                                       rtol=1e-4, atol=2e-4)

    def test_spatial_heads_refused(self, unified_native):
        """SE-gated/attention heads are refused: the 6-output contract can
        only bake MAP-grafted pose maps, which diverge p50 3.9°/max 26.5°
        from the per-vector function such heads are calibrated on
        (docs/headeval_divergence.json — the same reason best_detector()
        serves head_eval='survivors')."""
        import dataclasses

        model, params = unified_native
        se = H.SEMLPHead(88)
        bad = dataclasses.replace(model, head88=se)
        bad_params = dict(params, head88=se.init(jax.random.PRNGKey(0)))
        with pytest.raises(ValueError, match="survivors|per-vector"):
            export_unified_tflite(bad, bad_params, "/dev/null/never.tflite")


class TestEdgeCertificate:
    """Gates on docs/tflite_certification.json (scripts/certify_tflite.py):
    the exported flagship run image-by-image (batch 1, the edge shape) over
    the full parity corpus, raw outputs through the framework postprocess
    at production settings, matched against the reference-pipeline
    goldens."""

    def test_certificate_fresh_and_detection_identical(self):
        import hashlib
        import json

        cert_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                                 "tflite_certification.json")
        corpus = os.path.join(os.path.dirname(__file__), "golden",
                              "parity_corpus.npz")
        with open(cert_path) as f:
            cert = json.load(f)
        sha = hashlib.sha256(open(corpus, "rb").read()).hexdigest()
        assert cert["corpus_sha256"] == sha, \
            "stale certificate: re-run scripts/certify_tflite.py"
        assert cert["images"] == 112
        assert cert["set_agreement"] == 1.0          # detection-identical
        assert cert["pose_deg"]["n"] == 451          # every golden matched
        assert cert["pose_deg"]["max"] <= 1e-3       # 100x under the budget

    def test_camera_sized_frames_certified_against_reference(self):
        """The 'resize' section (scripts/certify_edge_resize.py): camera-
        sized frames through the reference's FULL detectFaces — which owns
        the TF bicubic resize — vs the edge pipeline's numpy TF-exact
        bicubic (ops/bicubic.py).  480 (the demo's center-square size) and
        333 (off the 1/1024 phase grid) must both be set-identical within
        the parity budget (VERDICT r3 item 4)."""
        import json

        cert_path = os.path.join(os.path.dirname(__file__), "..", "docs",
                                 "tflite_certification.json")
        with open(cert_path) as f:
            resize = json.load(f)["resize"]
        assert set(resize["sizes"]) == {"480", "333"}
        for size, rep in resize["sizes"].items():
            # the 333 crop keeps ~65% of the frame, so fewer targets
            # survive; agreement is certified over ALL 40 frames either
            # way (empties must agree too)
            assert rep["reference_detections"] > 10, size
            for path in ("edge_pipeline", "jax_highest"):
                r = rep[path]
                assert r["set_agreement"] == 1.0, (size, path)
                assert r["pose_deg"]["max"] < 1e-3, (size, path)


@pytest.mark.slow
def test_zoo_stratified_tflite_sweep(tmp_path):
    """Every 10th head of the 139-head stratified zoo sample (the same
    fixture test_h5_graph value-tests) exports to TFLite; the numeric gate
    inside export_h5_tflite (vs our graph compiler) is the assertion."""
    if not has_reference():
        pytest.skip("reference artifacts not mounted")
    g = np.load(os.path.join(os.path.dirname(__file__), "golden",
                             "zoo_heads.npz"), allow_pickle=True)
    names = list(g["names"])[::10]
    for n in names:
        path = str(g[f"path_{n}"])
        report = export_h5_tflite(path, str(tmp_path / f"{n}.tflite"))
        assert max(report["maxerr"].values()) <= 2e-4, (n, report)


class TestH5Export:
    def test_reference_zoo_artifact(self, tmp_path):
        """A shipped reference artifact (the production 96-d head) converts
        directly from its H5, validated against our graph compiler."""
        if not has_reference():
            pytest.skip("reference artifacts not mounted")
        report = export_h5_tflite(HRCHR, str(tmp_path / "z.tflite"))
        assert max(report["maxerr"].values()) <= 2e-4
        assert report["input_shape"] == (1, 1, 1, 96)

    def test_cli_head_h5(self, tmp_path):
        """CLI smoke: --model <h5> --out <tflite> writes a loadable
        artifact."""
        if not has_reference():
            pytest.skip("reference artifacts not mounted")
        from headpose_tpu.tools.tflite import main

        out = str(tmp_path / "cli.tflite")
        main(["--model", HRCHR, "--out", out])
        tm = TFLiteModel(out)
        x = np.zeros((1, 1, 1, 96), np.float32)
        assert next(iter(tm(**{tm.input_names[0]: x}).values())).shape \
            == (1, 1, 1, 3)


def test_best_model_exports_to_edge(tmp_path):
    """The served best model ('unified-best-distilled') edge-exports — the
    capability unified-best's SE-gated ensembles blocked (spatial-context
    refusal above).  Distilled plain-MLP heads bake exactly, and the
    EdgeDetector pipeline reproduces the JAX detector on a corpus image:
    the accuracy frontier ships to edge hosts (VERDICT r3 item 1)."""
    from headpose_tpu.pretrained import load_pretrained
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.runtime.edge import EdgeDetector, native_available

    if not native_available():
        pytest.skip("g++ unavailable")
    model, params = load_pretrained("unified-best-distilled")
    out = str(tmp_path / "best.tflite")
    report = export_unified_tflite(model, params, out)
    assert max(report["maxerr"].values()) <= 2e-4
    data = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                "parity_corpus.npz"))
    img = data["imgs"][0]
    want = FaceDetector(model, params, score_threshold=0.05).detect_single(img)
    got = EdgeDetector(out, score_threshold=0.05).detect_single(img)
    assert len(got) == len(want) > 0
    np.testing.assert_allclose(got.boxes, want.boxes, rtol=0, atol=1e-4)
    np.testing.assert_allclose(got.poses, want.poses, rtol=0, atol=5e-4)
