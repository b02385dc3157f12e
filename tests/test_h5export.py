"""Native → Keras-H5 exporter tests (tools/h5export.py).

Closes the reference ecosystem's artifact loop: heads/models trained here
become H5 files the reference toolchain consumes (JoinModels.py:29-31,
InputShapeConvertor.py validation, blazeFaceDetectorH5.py:96-102).

The keras-free tests round-trip through our own H5 reader (core.graph);
the tf-keras tests load with the actual reference-side loader (verified in
this container: head maxdiff 6e-7, unified 6-output maxdiff <=9e-5 — f32
conv accumulation-order noise between oneDNN and XLA).
"""
import os
import tempfile

import jax
import numpy as np
import pytest

from headpose_tpu.models import MLPHead
from headpose_tpu.tools.h5export import save_head_h5, save_unified_h5

# tf-keras round-trips: the heavy lane (CLAUDE.md test tiers)
pytestmark = [pytest.mark.heavy]


@pytest.fixture(scope="module")
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


class TestHeadExport:
    def _spec(self):
        spec = MLPHead(96, ((32, "tanh"), (16, "tanh"), (3, "linear")))
        return spec, spec.init(jax.random.PRNGKey(0))

    def test_roundtrip_own_reader(self, tmpdir):
        """Exported head loads through our keras-free graph compiler."""
        from headpose_tpu.core import load_graph_model

        spec, params = self._spec()
        path = os.path.join(tmpdir, "head.h5")
        save_head_h5(spec, params, path)
        gm = load_graph_model(path)
        x = np.random.default_rng(0).normal(size=(5, 2, 3, 96)).astype(np.float32)
        got = np.asarray(gm(x))  # single-output models return the array
        want = np.asarray(spec.apply(params, x))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_tf_keras_loads_it(self, tmpdir):
        """The reference-side loader (tf.keras.models.load_model) consumes
        the export — the JoinModels.py:29-31 contract."""
        keras = pytest.importorskip("tf_keras")
        spec, params = self._spec()
        path = os.path.join(tmpdir, "head_tf.h5")
        save_head_h5(spec, params, path)
        m = keras.models.load_model(path, compile=False)
        x = np.random.default_rng(1).normal(size=(7, 1, 1, 96)).astype(np.float32)
        got = m.predict(x, verbose=0)
        want = np.asarray(spec.apply(params, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestUnifiedExport:
    def test_roundtrip_own_reader(self, tmpdir):
        """Exported unified model re-imports through core.graph with the
        6-output reference signature intact."""
        from headpose_tpu.core import load_graph_model
        from headpose_tpu.pretrained import load_flagship

        model, params = load_flagship()
        path = os.path.join(tmpdir, "unified.h5")
        save_unified_h5(model, params, path)
        gm = load_graph_model(path)
        x = np.random.default_rng(2).uniform(-1, 1, (2, 128, 128, 3)
                                             ).astype(np.float32)
        got = [np.asarray(o) for o in gm(x)]
        want = [np.asarray(o) for o in model.reference_outputs(params, x)]
        assert [g.shape for g in got] == [w.shape for w in want]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=2e-4)

    def test_roundtrip_unified_best(self, tmpdir):
        """The shipped unified-best (flagship backbone + stacked-mixed
        EnsembleHead pose regressors) exports to the reference's 6-output H5
        contract (JoinModels.py:29-31): ensemble heads write as Concatenate
        + a fixed block-diagonal 1x1 conv nested inside the unified graph,
        and the export re-imports through core.graph numerically intact."""
        from headpose_tpu.core import load_graph_model
        from headpose_tpu.pretrained import load_pretrained

        model, params = load_pretrained("unified-best")
        path = os.path.join(tmpdir, "unified_best.h5")
        save_unified_h5(model, params, path)
        gm = load_graph_model(path)
        x = np.random.default_rng(3).uniform(-1, 1, (2, 128, 128, 3)
                                             ).astype(np.float32)
        got = [np.asarray(o) for o in gm(x)]
        want = [np.asarray(o) for o in model.reference_outputs(params, x)]
        assert [g.shape for g in got] == [w.shape for w in want]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=2e-4)

    def test_roundtrip_back_camera_spec(self, tmpdir):
        """Export of a 17-block (back-camera) unified model: SSD-head conv
        names must continue the backbone numbering, not collide with block
        16's pointwise conv (which silently corrupted the H5 before the
        round-2 fix)."""
        import jax
        from headpose_tpu.core import load_graph_model
        from headpose_tpu.models import BLAZEFACE_BACK, MLPHead
        from headpose_tpu.models.unified import join_models

        spec = BLAZEFACE_BACK
        bparams = spec.init(jax.random.PRNGKey(0))
        h88 = MLPHead(88, ((8, "softsign"), (3, "linear")))
        h96 = MLPHead(96, ((8, "tanh"), (3, "linear")))
        model, params = join_models(spec, bparams,
                                    h88, h88.init(jax.random.PRNGKey(1)),
                                    h96, h96.init(jax.random.PRNGKey(2)))
        path = os.path.join(tmpdir, "unified_back.h5")
        save_unified_h5(model, params, path)
        gm = load_graph_model(path)
        x = np.random.default_rng(4).uniform(-1, 1, (2, 256, 256, 3)
                                             ).astype(np.float32)
        got = [np.asarray(o) for o in gm(x)]
        want = [np.asarray(o) for o in model.reference_outputs(params, x)]
        assert [g.shape for g in got] == [w.shape for w in want]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=2e-4)

    @pytest.mark.slow
    def test_tf_keras_loads_unified(self, tmpdir):
        keras = pytest.importorskip("tf_keras")
        from headpose_tpu.pretrained import load_flagship

        model, params = load_flagship()
        path = os.path.join(tmpdir, "unified_tf.h5")
        save_unified_h5(model, params, path)
        m = keras.models.load_model(path, compile=False)
        x = np.random.default_rng(3).uniform(-1, 1, (2, 128, 128, 3)
                                             ).astype(np.float32)
        got = m.predict(x, verbose=0)
        want = [np.asarray(o) for o in model.reference_outputs(params, x)]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=2e-4)


class TestAllFamilyExports:
    """All five head families export to tf-keras-loadable H5 — including the
    SE-Transformer, whose Lambda layers are emitted as marshalled bytecode
    exactly like the reference's own builder serializes them (such files load
    under the writing CPython version only; a format limitation the
    reference's shipped MHA artifacts share)."""

    @pytest.mark.parametrize("family",
                             ["residual", "skip", "se", "se_transformer",
                              "ensemble", "ensemble_stacked"])
    def test_family_roundtrip(self, family, tmpdir):
        keras = pytest.importorskip("tf_keras")
        from headpose_tpu.models import (MLPHead, ResidualMLPHead,
                                         SkipMLPHead, SEMLPHead,
                                         SETransformerHead, EnsembleHead)

        spec = {"residual": ResidualMLPHead(in_features=88),
                "skip": SkipMLPHead(in_features=88),
                "se": SEMLPHead(in_features=88),
                "se_transformer": SETransformerHead(in_features=88),
                # mixed-family members: name-prefix isolation is the point
                "ensemble": EnsembleHead(members=(
                    MLPHead(88, ((32, "tanh"), (3, "linear"))),
                    SkipMLPHead(in_features=88),
                    SEMLPHead(in_features=88))),
                # stack weights ride a Concatenate + fixed 1x1 Conv2D
                "ensemble_stacked": EnsembleHead(members=(
                    MLPHead(88, ((32, "tanh"), (3, "linear"))),
                    SkipMLPHead(in_features=88)),
                    weights=((0.7, -0.1, 0.4), (0.5, 1.2, 0.6)),
                    bias=(0.3, -0.2, 0.1))}[family]
        params = spec.init(jax.random.PRNGKey(1))
        path = os.path.join(tmpdir, f"{family}.h5")
        save_head_h5(spec, params, path)
        m = keras.models.load_model(path, compile=False)
        x = np.random.default_rng(0).normal(
            size=(5, 2, 2, spec.in_features)).astype(np.float32)
        np.testing.assert_allclose(m.predict(x, verbose=0),
                                   np.asarray(spec.apply(params, x)),
                                   rtol=1e-5, atol=1e-5)

    def test_se_transformer_spatial_roundtrip(self, tmpdir):
        """The attention head on its production 16x16x88 feature-map input
        (256 spatial tokens — the shape JoinModels grafts it at)."""
        keras = pytest.importorskip("tf_keras")
        from headpose_tpu.models import SETransformerHead

        spec = SETransformerHead(in_features=88)
        params = spec.init(jax.random.PRNGKey(3))
        path = os.path.join(tmpdir, "se_tr.h5")
        save_head_h5(spec, params, path)
        m = keras.models.load_model(path, compile=False)
        x = np.random.default_rng(7).normal(size=(2, 16, 16, 88)
                                            ).astype(np.float32)
        np.testing.assert_allclose(m.predict(x, verbose=0),
                                   np.asarray(spec.apply(params, x)),
                                   rtol=1e-5, atol=1e-5)

    def test_trained_head_roundtrip(self, tmpdir):
        """Train here -> export -> the reference-side loader evaluates the
        SAME model: the full 'consume our artifacts' workflow."""
        keras = pytest.importorskip("tf_keras")
        from headpose_tpu.data.datasets import Dataset
        from headpose_tpu.train import config_96, fit

        rng = np.random.default_rng(0)
        ds = Dataset(rng.normal(size=(256, 96)).astype(np.float32),
                     rng.normal(size=(256, 3)).astype(np.float32))
        cfg = config_96(total_epochs=5, early_stopping_patience=10,
                        checkpoint_dir=str(tmpdir), run_name="exp")
        result = fit(cfg, ds)
        path = os.path.join(tmpdir, "trained.h5")
        save_head_h5(result.spec, result.params, path)
        m = keras.models.load_model(path, compile=False)
        x = rng.normal(size=(64, 1, 1, 96)).astype(np.float32)
        np.testing.assert_allclose(
            m.predict(x, verbose=0).reshape(64, 3),
            np.asarray(result.spec.apply(result.params, x)).reshape(64, 3),
            rtol=1e-5, atol=1e-5)


class TestKeras3LoadsExports:
    """Stock Keras 3 (not tf-keras) consumes our exports too: its legacy-H5
    reader handles the conv/dense families natively, and the attention family
    loads through tools.h5export.keras3_custom_objects() — the three-subclass
    shim for the reader's MHA-config, Lambda-globals, and kwarg-tensor-ref
    gaps (see its docstring).  Guards both Keras generations as consumers."""

    @staticmethod
    def _keras3():
        keras = pytest.importorskip("keras")
        if not keras.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        return keras

    @pytest.mark.parametrize("family", ["mlp", "residual", "skip", "se",
                                        "ensemble"])
    def test_plain_families(self, family, tmpdir):
        keras = self._keras3()
        from headpose_tpu.models import (EnsembleHead, ResidualMLPHead,
                                         SEMLPHead, SkipMLPHead)

        spec = {"mlp": MLPHead(88, ((32, "tanh"), (3, "linear"))),
                "residual": ResidualMLPHead(in_features=88),
                "skip": SkipMLPHead(in_features=88),
                "se": SEMLPHead(in_features=88),
                "ensemble": EnsembleHead(members=(
                    MLPHead(88, ((32, "tanh"), (3, "linear"))),
                    SkipMLPHead(in_features=88)))}[family]
        params = spec.init(jax.random.PRNGKey(1))
        path = os.path.join(tmpdir, f"k3_{family}.h5")
        save_head_h5(spec, params, path)
        m = keras.models.load_model(path, compile=False)
        x = np.random.default_rng(0).normal(
            size=(5, 2, 2, spec.in_features)).astype(np.float32)
        np.testing.assert_allclose(m.predict(x, verbose=0),
                                   np.asarray(spec.apply(params, x)),
                                   rtol=1e-5, atol=1e-5)

    def test_se_transformer_via_custom_objects(self, tmpdir):
        keras = self._keras3()
        from headpose_tpu.models import SETransformerHead
        from headpose_tpu.tools.h5export import keras3_custom_objects

        spec = SETransformerHead(in_features=88)
        params = spec.init(jax.random.PRNGKey(1))
        path = os.path.join(tmpdir, "k3_set.h5")
        save_head_h5(spec, params, path)
        # without the shim Keras 3 must refuse (MHA rejects the tf-keras
        # query/key/value_shape keys) — guards that the shim is still needed
        with pytest.raises(Exception):
            keras.models.load_model(path, compile=False, safe_mode=False)
        m = keras.models.load_model(path, compile=False, safe_mode=False,
                                    custom_objects=keras3_custom_objects())
        x = np.random.default_rng(0).normal(size=(5, 2, 2, 88)
                                            ).astype(np.float32)
        np.testing.assert_allclose(m.predict(x, verbose=0),
                                   np.asarray(spec.apply(params, x)),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_unified(self, tmpdir):
        keras = self._keras3()
        from headpose_tpu.pretrained import load_flagship

        from headpose_tpu.tools.h5export import keras3_custom_objects

        model, params = load_flagship()
        path = os.path.join(tmpdir, "k3_unified.h5")
        save_unified_h5(model, params, path)
        # the channel-pad skip nodes are TensorFlowOpLayers → needs the shim
        m = keras.models.load_model(path, compile=False,
                                    custom_objects=keras3_custom_objects())
        x = np.random.default_rng(3).uniform(-1, 1, (2, 128, 128, 3)
                                             ).astype(np.float32)
        got = m.predict(x, verbose=0)
        want = [np.asarray(o) for o in model.reference_outputs(params, x)]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, atol=2e-4)
