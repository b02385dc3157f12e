"""Feature-extraction pipeline tests, including the full framework loop:
extract features → train a head → join → detect."""
import os

import numpy as np
import pytest

from conftest import has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="needs the pretrained flagship (reference import)")

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def extractor():
    from headpose_tpu.tools.extract_features import FeatureExtractor
    return FeatureExtractor(score_threshold=0.05)


def test_extracted_feature_reproduces_pipeline_pose(extractor, production_detector):
    """Self-consistency across the whole stack: the pose head applied to the
    EXTRACTED feature vector must reproduce the detection pipeline's pose for
    the same (best) face — they read the same feature-map cell."""
    g = np.load(os.path.join(GOLDEN, "e2e.npz"))
    img = g["img0"]
    res = production_detector.detect_single(img)
    best_pose = res.poses[0]  # score-descending → slot 0 is the best face

    r = extractor.extract(img)
    assert r.found[0]
    model, params = extractor.model, extractor.params
    # the best face lives on one of the two maps; its head applied to the
    # extracted vector must reproduce the pipeline pose exactly
    pose88 = np.asarray(model.head88.apply(params["head88"], r.features88[0]))
    pose96 = np.asarray(model.head96.apply(params["head96"], r.features96[0]))
    err = min(np.abs(pose88 - best_pose).max(), np.abs(pose96 - best_pose).max())
    assert err < 1e-3, (pose88, pose96, best_pose)


def test_extract_no_face(extractor):
    from headpose_tpu.tools.extract_features import FeatureExtractor
    strict = FeatureExtractor(score_threshold=0.9)
    r = strict.extract(np.zeros((1, 128, 128, 3), np.uint8))
    assert not r.found[0]


def test_full_framework_loop(tmp_path, extractor):
    """images → extract_dataset → train head → join → detect: every stage of
    the framework in one pass (the reference needed a separate repo for the
    first stage and Keras graph surgery for the third)."""
    import jax
    from headpose_tpu.tools.extract_features import extract_dataset
    from headpose_tpu.data import load_dataset
    from headpose_tpu.train import config_96, fit
    from headpose_tpu.models import join_models
    from headpose_tpu.runtime import FaceDetector

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (24, 128, 128, 3)).astype(np.uint8)
    poses = rng.uniform(-60, 60, (24, 3)).astype(np.float32)

    p88 = str(tmp_path / "ds88.npz")
    p96 = str(tmp_path / "ds96.npz")
    found = extract_dataset(images, poses, out_88=p88, out_96=p96,
                            batch_size=8, extractor=extractor)
    assert found.sum() > 8  # noise at threshold 0.05 fires on most images

    ds = load_dataset(p96)
    assert ds.num_features == 96
    cfg = config_96(num_filters=8, total_epochs=5, batch_size=8,
                    checkpoint_dir=str(tmp_path / "ck"), run_name="loop")
    result = fit(cfg, ds)

    ds88 = load_dataset(p88)
    cfg88 = config_96(in_features=88, num_filters=8, total_epochs=5, batch_size=8,
                      checkpoint_dir=str(tmp_path / "ck88"), run_name="loop88")
    result88 = fit(cfg88, ds88)

    model, params = join_models(
        extractor.model.backbone, extractor.params["backbone"],
        result88.spec, result88.params, result.spec, result.params)
    det = FaceDetector(model, params, score_threshold=0.05)
    out = det.detect_single(images[0])
    assert np.isfinite(out.poses).all()


def test_threshold_mutation_retraces(extractor):
    """Serving-config mutation must take effect (the config enters the jit
    as static args; a static-self trace would silently reuse the old
    threshold — round-3 fix)."""
    g = np.load(os.path.join(GOLDEN, "e2e.npz"))
    r_low = extractor.extract(g["img0"])
    assert bool(r_low.found[0])
    old = extractor.score_threshold
    try:
        extractor.score_threshold = 0.999999
        r_high = extractor.extract(g["img0"])
        assert not bool(r_high.found[0])
    finally:
        extractor.score_threshold = old
