"""Precision-mode certification gates on the parity-validation corpus.

The corpus (tests/golden/parity_corpus.npz, scripts/make_parity_corpus.py) is
112 detection-rich 128x128 images with 451 reference detections captured from
the reference pipeline at PRODUCTION settings (threshold 0.4,
blazeFaceDetectorH5.py:82,109-126).  Round 2's mode-parity claims rested on a
3-image max; these tests gate them on the full distribution:

  * 'highest' (and 'fast' on TPU) must match the reference detection-for-
    detection — certified on-chip by scripts/certify_modes.py, whose committed
    docs/certification.json this suite validates (sha-pinned to the corpus).
  * The corpus finding the 3-image max missed: NO single-pass-bf16 backbone
    island holds pose p99 < 0.1 deg (docs/turbo_island_probe.json) — so
    'fast' is the fastest parity-certified mode and 'turbo'/'max' are
    accuracy-mode (non-parity) serving, as their docs now state.
"""
import hashlib
import json
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CORPUS = os.path.join(GOLDEN, "parity_corpus.npz")
CERT = os.path.join(os.path.dirname(__file__), "..", "docs",
                    "certification.json")

PARITY_BUDGET_DEG = 0.1   # BASELINE.md: MAE within 0.1 deg of the reference


@pytest.fixture(scope="module")
def corpus():
    return dict(np.load(CORPUS))


@pytest.fixture(scope="module")
def cert():
    with open(CERT) as f:
        return json.load(f)


@pytest.mark.smoke
class TestCorpusIntegrity:
    def test_size_and_richness(self, corpus):
        assert len(corpus["imgs"]) >= 100
        assert corpus["imgs"].dtype == np.uint8
        assert corpus["imgs"].shape[1:] == (128, 128, 3)
        assert (corpus["counts"] >= 1).all()
        assert corpus["counts"].sum() >= 300          # detection-rich
        assert corpus["counts"].max() >= 4            # multi-face layouts

    def test_certificate_is_for_this_corpus(self, cert):
        sha = hashlib.sha256(open(CORPUS, "rb").read()).hexdigest()
        assert cert["corpus_sha256"] == sha, (
            "docs/certification.json is stale — re-run "
            "scripts/certify_modes.py on the TPU after changing the corpus")
        assert cert["images"] == 112
        assert cert["reference_detections"] == 451


@pytest.mark.smoke
class TestCertifiedDistributions:
    """Gates on the committed on-chip certification (VERDICT r2 item 1)."""

    def test_ran_on_tpu(self, cert):
        assert cert["backend"] != "cpu", (
            "certification must be captured on the real chip — precision "
            "islands are a no-op on CPU")

    @pytest.mark.parametrize("mode", ["highest", "fast"])
    def test_parity_modes_hold_the_budget(self, cert, mode):
        r = cert["modes"][mode]
        assert r["set_agreement"] == 1.0, f"{mode}: detection sets diverged"
        assert r["pose_deg"]["n"] == cert["reference_detections"]
        assert r["pose_deg"]["p99"] < PARITY_BUDGET_DEG
        assert r["pose_deg"]["max"] < PARITY_BUDGET_DEG

    def test_highest_is_reference_exact(self, cert):
        assert cert["modes"]["highest"]["pose_deg"]["max"] < 0.01
        assert cert["modes"]["highest"]["score"]["max"] < 1e-4

    @pytest.mark.parametrize("mode", ["turbo", "max"])
    def test_accuracy_modes_are_recorded(self, cert, mode):
        """turbo/max are NON-parity accuracy modes; the certificate must
        carry their true distributions (they exceed the budget — that is the
        documented finding, not a regression)."""
        r = cert["modes"][mode]
        assert r["pose_deg"]["n"] > 400
        assert r["pose_deg"]["p99"] > 0
        # if a future calibration brings these inside the budget, promote the
        # mode and update the serving docs (detector.py, docs/BENCH.md)


class TestCpuParityOnCorpus:
    """CPU-runnable ground truth: 'highest' must reproduce the reference on
    corpus images (subset — the full 112 run on CPU is the TPU script's job)."""

    def test_highest_matches_reference(self, corpus):
        from headpose_tpu.pretrained import flagship_detector

        det = flagship_detector(score_threshold=0.4, precision="highest")
        n = 6
        batch = det.detect(corpus["imgs"][:n])
        per = batch.trim()
        for i in range(n):
            c = int(corpus["counts"][i])
            assert len(per[i]) == c
            # both sides emit score-descending; identical sets => same order
            np.testing.assert_allclose(np.asarray(per[i].scores),
                                       corpus["scores"][i, :c], atol=1e-5)
            np.testing.assert_allclose(np.asarray(per[i].boxes),
                                       corpus["boxes"][i, :c], atol=1e-4)
            np.testing.assert_allclose(np.asarray(per[i].poses),
                                       corpus["poses"][i, :c], atol=2e-3)


STRESS_CORPUS = os.path.join(GOLDEN, "stress_corpus.npz")


@pytest.fixture(scope="module")
def stress(cert):
    if "stress" not in cert:
        pytest.skip("stress certification not yet captured "
                    "(scripts/certify_stress.py)")
    return cert["stress"]


@pytest.mark.smoke
class TestStressCertification:
    """Boundary-stress gates (VERDICT r3 item 3): the contract's edges —
    threshold-straddling scores, NMS-boundary IoU~0.3 clusters, >=20-target
    saturation — certified per axis (scripts/make_stress_corpus.py +
    certify_stress.py)."""

    def test_corpus_shape_and_adversarial_axes(self):
        d = dict(np.load(STRESS_CORPUS))
        axes = d["axis"]
        assert set(axes) == {"threshold", "nms", "saturation", "overflow"}
        # threshold axis: reference detections hug the production cutoff
        sel = np.where(axes == "threshold")[0]
        sc = np.concatenate([d["scores"][i, :d["counts"][i]] for i in sel])
        assert np.percentile(sc, 50) < 0.55 and sc.min() < 0.43
        # saturation axis reaches far beyond the primary corpus's 5 faces
        assert d["counts"][axes == "saturation"].max() >= 20
        # the saturation packing is genuinely multi-anchor-per-macro-cell
        # now (ADVICE r4: the old second-grid branch was dead code) — at
        # least one image holds two reference detections whose box centers
        # fall in the SAME 16px macro-cell
        multi = False
        for i in np.where(axes == "saturation")[0]:
            b = d["boxes"][i, :d["counts"][i]]
            cells = {(int(((b[j, 1] + b[j, 3]) / 2) * 8),
                      int(((b[j, 0] + b[j, 2]) / 2) * 8)): 0
                     for j in range(len(b))}
            if len(cells) < len(b):
                multi = True
                break
        assert multi, "no saturated image packs 2+ survivors per macro-cell"
        # nms axis: surviving reference pairs reach right under the 0.3
        # suppression boundary (pairs above it were suppressed — that edge
        # is exactly what the axis exercises)
        best = 0.0
        for i in np.where(axes == "nms")[0]:
            b = d["boxes"][i, :d["counts"][i]]
            for p in range(len(b)):
                for q in range(p + 1, len(b)):
                    x1 = max(b[p, 0], b[q, 0]); y1 = max(b[p, 1], b[q, 1])
                    x2 = min(b[p, 2], b[q, 2]); y2 = min(b[p, 3], b[q, 3])
                    inter = max(x2 - x1, 0) * max(y2 - y1, 0)
                    ua = (b[p, 2] - b[p, 0]) * (b[p, 3] - b[p, 1])
                    ub = (b[q, 2] - b[q, 0]) * (b[q, 3] - b[q, 1])
                    best = max(best, inter / (ua + ub - inter))
        assert 0.25 < best <= 0.3 + 1e-6

    def test_certificate_is_for_this_corpus(self, stress):
        import hashlib

        sha = hashlib.sha256(open(STRESS_CORPUS, "rb").read()).hexdigest()
        assert stress["corpus_sha256"] == sha, (
            "stress section of docs/certification.json is stale — re-run "
            "scripts/certify_stress.py after changing the corpus")
        assert stress["backend"] != "cpu"

    @pytest.mark.parametrize("mode", ["highest", "fast"])
    def test_parity_modes_hold_at_the_boundaries(self, stress, mode):
        for axis, r in stress["modes"][mode].items():
            if axis == "overflow_order":
                continue   # gated in TestOverflowCertification
            assert r["set_agreement"] == 1.0, (
                f"{mode}/{axis}: detection sets diverged at the boundary")
            assert r["pose_deg"]["max"] < PARITY_BUDGET_DEG

    def test_pallas_postprocess_matches_at_the_boundaries(self, stress):
        if "modes_pallas_postprocess" not in stress:
            pytest.skip("pallas postprocess not captured")
        for mode, per_axis in stress["modes_pallas_postprocess"].items():
            for axis, r in per_axis.items():
                want = stress["modes"][mode][axis]
                if axis == "overflow_order":
                    assert r["order_exact"] == r["images"]
                    continue
                assert r["set_agreement"] == want["set_agreement"]
                assert r["pose_deg"] == want["pose_deg"], (
                    f"pallas {mode}/{axis} diverges from the XLA postprocess")

    def test_deployment_artifacts_hold_at_the_boundaries(self, stress):
        for section in ("tflite_edge", "aot_fast"):
            if section not in stress:
                pytest.skip(f"{section} stress section not yet captured")
            for axis, r in stress[section].items():
                if axis == "overflow_order":
                    continue   # gated in test_overflow_truncation_order
                if axis == "overflow_uncapped":
                    # the C++ postprocess must reproduce the reference's
                    # FULL >100-survivor sets at max_faces=256 too
                    assert r["count_match"] == r["images"]
                    assert r["order"]["order_exact"] == r["images"]
                assert r["set_agreement"] == 1.0, f"{section}/{axis}"
                assert r["pose_deg"]["max"] < PARITY_BUDGET_DEG


@pytest.mark.smoke
class TestOverflowCertification:
    """MAX_FACE_NUM=100 overflow (VERDICT r4 item 2): >100 mutually-
    surviving candidates must truncate EXACTLY like the reference's
    tf.image.non_max_suppression(max_output_size=100,
    blazeFaceDetectorH5.py:8-9,332) — survivor identity AND emission order
    at the cap, plus agreement on the full uncapped survivor set."""

    def test_corpus_exercises_the_cap(self):
        d = dict(np.load(STRESS_CORPUS))
        ov = d["counts"][d["axis"] == "overflow"]
        assert len(ov) >= 8
        assert (ov == 100).sum() >= len(ov) // 2, \
            "most overflow images must hit the MAX_FACE_NUM=100 slab"
        # the uncapped capture proves truncation was real: >100 survivors
        assert (d["ov_counts"] > 100).sum() >= (ov == 100).sum()
        assert int(d["ov_counts"].max()) > 110

    def test_overflow_truncation_order(self, stress):
        """Every parity path reproduces the reference's truncation order
        elementwise — same survivors, same positions, at the cap."""
        sections = [("modes.highest", stress["modes"]["highest"]),
                    ("modes.fast", stress["modes"]["fast"])]
        for mode, rep in stress.get("modes_pallas_postprocess", {}).items():
            sections.append((f"pallas.{mode}", rep))
        for name in ("aot_fast", "tflite_edge"):
            if name in stress:
                sections.append((name, stress[name]))
        for name, rep in sections:
            o = rep["overflow_order"]
            assert o["order_exact"] == o["images"], (
                f"{name}: truncation order diverged from the reference "
                f"({o['order_exact']}/{o['images']})")
            assert o["capped_images"] >= o["images"] // 2

    def test_uncapped_survivor_sets_agree(self, stress):
        if "overflow_uncapped" not in stress:
            pytest.skip("uncapped overflow section not yet captured")
        for mode, r in stress["overflow_uncapped"].items():
            assert r["set_agreement"] == 1.0, f"uncapped/{mode}"
            assert r["count_match"] == r["images"], f"uncapped/{mode}"
            assert r["order"]["order_exact"] == r["images"]
            assert r["max_uncapped_survivors"] > 110
            assert r["pose_deg"]["max"] < PARITY_BUDGET_DEG


@pytest.mark.smoke
class TestBestDetectorCertification:
    """The SERVED DEFAULT (best_detector() -> 'unified-best-distilled') is
    itself stress-certified (VERDICT r4 item 1): detection sets, boxes and
    scores identical to the flagship rows on every boundary image — under
    the resolved default profile, 'fast', and the chunked >128-batch path.
    Poses are the distilled frontier's intentional improvement over the
    reference heads: recorded in the certificate, not parity-gated."""

    @pytest.fixture(scope="class")
    def best(self, stress):
        if "best_detector" not in stress:
            pytest.skip("best_detector stress section not yet captured "
                        "(scripts/certify_stress.py)")
        return stress["best_detector"]

    @pytest.mark.parametrize("profile", ["default", "fast",
                                         "fast_chunked_gt128"])
    def test_detection_sets_identical_at_the_boundaries(self, best, profile):
        rep = best[profile]
        for axis in ("threshold", "nms", "saturation", "overflow"):
            r = rep[axis]
            assert r["set_agreement"] == 1.0, f"best/{profile}/{axis}"
            assert r["box_norm"]["max"] < 1e-2, f"best/{profile}/{axis}"
            assert r["score"]["max"] < 1e-2, f"best/{profile}/{axis}"
            # poses recorded (the distilled heads differ from the reference
            # heads BY DESIGN — that delta is the accuracy win, not drift)
            assert r["pose_deg"]["n"] > 0
        o = rep["overflow_order"]
        assert o["order_exact"] == o["images"], f"best/{profile}: order"

    def test_served_profile_is_recorded(self, best):
        p = best["default"]["resolved_profile"]
        assert p["artifact"] == "unified-best-distilled"
        assert p["head_eval"] in ("map", "auto")
        assert p["max_faces"] == 100

    def test_chunked_path_is_bitwise_consistent(self, best):
        rep = best["fast_chunked_gt128"]
        assert rep["batch"] > 128
        assert rep["duplicate_halves_bitwise_equal"] is True
