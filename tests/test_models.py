"""Native model tests: anchors, head zoo, BlazeFace backbone, unified model."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from headpose_tpu.models import (
    AnchorConfig, generate_anchors,
    MLPHead, ResidualMLPHead, SkipMLPHead, SEMLPHead, SETransformerHead,
    EnsembleHead, BLAZEFACE_FRONT, head_from_h5, unified_from_h5,
)

from conftest import REFERENCE_ROOT, has_reference

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
needs_reference = pytest.mark.skipif(
    not has_reference(), reason="reference artifacts not mounted")


@pytest.mark.smoke
class TestAnchors:
    def test_front_config_matches_reference(self):
        """Bit-exact vs the captured gen_anchors table (blazeFaceUtils.py:59-127)."""
        golden = np.load(os.path.join(GOLDEN, "anchors.npz"))["anchors"]
        ours = generate_anchors()
        assert ours.shape == (896, 4)
        np.testing.assert_array_equal(ours, golden)

    def test_structure(self):
        a = generate_anchors()
        # 512 anchors on the 16x16 stride-8 grid, 2 per cell; 384 on 8x8, 6 per cell
        assert (a[:512, 2:] == 1.0).all() and (a[512:, 2:] == 1.0).all()
        assert np.isclose(a[0, 0], 0.5 / 16) and np.isclose(a[0, 1], 0.5 / 16)
        assert np.isclose(a[512, 0], 0.5 / 8)

    def test_variable_size_anchors(self):
        a = generate_anchors(AnchorConfig(fixed_anchor_size=False))
        assert a.shape == (896, 4)
        assert not (a[:, 2:] == 1.0).all()


class TestHeadZoo:
    """Every head family: init → apply on both (N, C) and (B, H, W, C)."""

    @pytest.mark.parametrize("spec", [
        MLPHead(96, ((32, "tanh"), (16, "tanh"), (3, "linear"))),
        MLPHead(88, ((3, "linear"),)),
        ResidualMLPHead(in_features=88),
        SkipMLPHead(in_features=88),
        SEMLPHead(in_features=88),
        SETransformerHead(in_features=88),
        EnsembleHead(members=(MLPHead(88, ((32, "tanh"), (3, "linear"))),
                              SkipMLPHead(in_features=88))),
    ])
    def test_shapes(self, spec):
        key = jax.random.PRNGKey(0)
        params = spec.init(key)
        c = spec.in_features
        y = spec.apply(params, jnp.zeros((5, c)))
        assert y.shape == (5, 3)
        ym = spec.apply(params, jax.random.normal(key, (2, 4, 4, c)))
        assert ym.shape == (2, 4, 4, 3)
        assert np.isfinite(np.asarray(ym)).all()

    def test_fully_convolutional_consistency(self):
        """Per-cell outputs of a map must equal per-row outputs of the rows —
        the property InputShapeConvertor existed to preserve."""
        spec = MLPHead(96, ((32, "tanh"), (3, "linear")))
        params = spec.init(jax.random.PRNGKey(1))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 96))
        y_map = spec.apply(params, x)
        y_rows = spec.apply(params, x.reshape(-1, 96)).reshape(2, 8, 8, 3)
        np.testing.assert_allclose(np.asarray(y_map), np.asarray(y_rows), rtol=1e-6)

    def test_dropout_train_vs_eval(self):
        spec = MLPHead(96, ((32, "tanh"), (3, "linear")), dropout_rate=0.5)
        params = spec.init(jax.random.PRNGKey(0))
        x = jnp.ones((4, 96))
        y_eval = spec.apply(params, x)
        y_train = spec.apply(params, x, train=True, rng=jax.random.PRNGKey(3))
        assert not np.allclose(np.asarray(y_eval), np.asarray(y_train))

    def test_l2_penalty(self):
        spec = MLPHead(96, ((32, "tanh"), (3, "linear")))
        params = spec.init(jax.random.PRNGKey(0))
        assert float(spec.l2_penalty(params, 1e-3)) > 0.0
        assert spec.l2_penalty(params, 0.0) == 0.0


@needs_reference
@pytest.mark.smoke
class TestNativeImport:
    def test_head_import_parity(self):
        g = np.load(os.path.join(GOLDEN, "heads.npz"))
        spec, params = head_from_h5(os.path.join(
            REFERENCE_ROOT, "Model-96/Trained-Models-96-ReshapedInput-NoFlatten/hrchr82r.h5"))
        assert spec.layers == ((32, "tanh"), (16, "tanh"), (3, "linear"))
        y = np.asarray(spec.apply(params, g["x96"].reshape(16, 96)))
        np.testing.assert_allclose(y, g["y96"].reshape(16, 3), rtol=1e-4, atol=1e-4)

    def test_head_import_fixed_shape_variant(self):
        """The pre-conversion (Flatten) artifact imports to the same head."""
        spec, params = head_from_h5(os.path.join(
            REFERENCE_ROOT, "Model-96/Trained-Models-96/model_runid_hrchr82r.h5"))
        assert spec.layers == ((32, "tanh"), (16, "tanh"), (3, "linear"))

    def test_unified_native_parity(self, unified_native):
        g = np.load(os.path.join(GOLDEN, "unified_forward.npz"))
        model, params = unified_native
        outs = jax.jit(model.reference_outputs)(params, g["inputs"])
        for i, o in enumerate(outs):
            np.testing.assert_allclose(
                np.asarray(o), g[f"out{i}"], rtol=1e-3, atol=2e-4,
                err_msg=f"output {i}")

    def test_backbone_batch_polymorphic(self, unified_native):
        model, params = unified_native
        for b in (1, 3):
            out = model.apply(params, jnp.zeros((b, 128, 128, 3)))
            assert out["scores"].shape == (b, 896)
            assert out["loc"].shape == (b, 896, 16)
            assert out["pose_front"].shape == (b, 16, 16, 3)
            assert out["pose_back"].shape == (b, 8, 8, 3)

    @pytest.mark.heavy  # 20s; the documented bf16 error measurements live in docs/BENCH.md
    def test_bf16_activations_bounded(self, unified_native):
        """bfloat16 backbone is opt-in: measured divergence on random inputs is
        up to ~1.3 degrees per pose-map cell (why f32 stays the accuracy-path
        default; the MAE budget in BASELINE.md is 0.1 degrees)."""
        g = np.load(os.path.join(GOLDEN, "unified_forward.npz"))
        model, params = unified_native
        full = model.apply(params, g["inputs"])
        bf = model.backbone.apply(params["backbone"], g["inputs"], dtype=jnp.bfloat16)
        pose_f32 = np.asarray(full["pose_front"])
        pose_bf = np.asarray(model.head88.apply(
            params["head88"], bf["feat88"].astype(jnp.float32)))
        assert np.abs(pose_f32 - pose_bf).max() < 3.0  # degrees, documented bound


@needs_reference
def test_se_transformer_import_three_way_agreement():
    """The 7 shipped SE-Transformer artifacts cannot be loaded by tf-keras in
    a modern environment (their Lambda layers carry Python-version-pinned
    marshal bytecode).  Our three independent implementations — the graph
    compiler, the native head, and the Pallas kernel — must agree on them."""
    from headpose_tpu.models import se_transformer_from_h5
    from headpose_tpu.core import load_graph_model
    from headpose_tpu.ops.pallas import se_transformer_forward

    path = os.path.join(REFERENCE_ROOT, "Model-88/Trained-Models-88/ker7z9mv.h5")
    spec, params = se_transformer_from_h5(path)
    assert spec.in_features == 88 and spec.num_heads == 1
    gm = load_graph_model(path)
    xm = np.random.default_rng(11).normal(size=(2, 16, 16, 88)).astype(np.float32)
    y_graph = np.asarray(gm(xm))
    y_native = np.asarray(spec.apply(params, xm))
    y_pallas = np.asarray(se_transformer_forward(spec, params, xm, interpret=True))
    np.testing.assert_allclose(y_native, y_graph, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y_pallas, y_graph, rtol=1e-4, atol=1e-4)


class TestEnsembleHead:
    """EnsembleHead: average-of-members semantics, validation, and the
    serialization/TP plumbing that makes it a first-class head family.  The
    reference sweeps 109 runs and ships one winner (Model-96/sweep.yaml,
    blazeFaceDetectorH5.py:102); the ensemble turns the discarded pool into
    accuracy (scripts/ensemble88.py)."""

    def _mixed(self):
        spec = EnsembleHead(members=(
            MLPHead(88, ((64, "softsign"), (3, "linear"))),
            SkipMLPHead(in_features=88),
            SEMLPHead(in_features=88)))
        return spec, spec.init(jax.random.PRNGKey(0))

    def test_apply_is_member_mean(self):
        spec, params = self._mixed()
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(6, 88)).astype(np.float32))
        want = sum(m.apply(p, x)
                   for m, p in zip(spec.members, params["members"])) / 3
        np.testing.assert_allclose(np.asarray(spec.apply(params, x)),
                                   np.asarray(want), atol=1e-6)

    def test_grouped_inference_matches_sequential(self):
        """Members with identical specs evaluate through ONE vmapped program
        at inference (EnsembleHead._apply_grouped — the 99-member
        unified-best pipeline went from 3.0x to 1.87x the flagship's
        dispatch time on-chip from this, docs/unified_best_cost.json).  The grouped path must match the
        sequential member-sum semantics, and the TRAINING path must keep the
        exact sequential per-member fold_in(rng, i) dropout streams."""
        m1 = MLPHead(88, ((16, "tanh"), (3, "linear")), dropout_rate=0.3)
        m2 = SEMLPHead(in_features=88)
        spec = EnsembleHead(members=(m1, m1, m2, m1),
                            weights=((0.7, -0.1, 0.4), (0.5, 1.2, 0.6),
                                     (-0.2, 0.3, 0.1), (1.1, 0.2, -0.5)),
                            bias=(0.3, -0.2, 0.1))
        params = spec.init(jax.random.PRNGKey(5))
        x = jnp.asarray(np.random.default_rng(7).normal(
            size=(5, 2, 2, 88)).astype(np.float32))
        want = sum(np.asarray(m.apply(p, x)) * np.asarray(w, np.float32)
                   for m, p, w in zip(spec.members, params["members"],
                                      spec.weights)) + np.asarray(spec.bias)
        np.testing.assert_allclose(np.asarray(spec.apply(params, x)),
                                   want, rtol=2e-6, atol=1e-6)

        rng = jax.random.PRNGKey(9)
        got_train = np.asarray(spec.apply(params, x, train=True, rng=rng))
        want_train = sum(
            np.asarray(m.apply(p, x, train=True,
                               rng=jax.random.fold_in(rng, i)))
            * np.asarray(w, np.float32)
            for i, (m, p, w) in enumerate(zip(spec.members,
                                              params["members"],
                                              spec.weights))
        ) + np.asarray(spec.bias)
        np.testing.assert_allclose(got_train, want_train, rtol=2e-6,
                                   atol=1e-6)
        assert not np.allclose(got_train, want)  # dropout actually active

    def test_heterogeneous_members_match_sequential(self):
        """A realistic unified-best-shaped member mix — heterogeneous MLP
        widths/depths/activations, duplicate specs, and a non-MLP member —
        must match the sequential member-sum to reassociation ulps through
        the grouped inference path.  (A width-bucketed zero-padded
        supergroup merge of the heterogeneous MLPs was built, passed this
        test, and was REVERTED after paired on-chip probes measured it
        SLOWER — the stacks are activation-slab-HBM-bound, not chain-count
        bound; see EnsembleHead._apply_grouped's docstring.)"""
        members = (
            MLPHead(88, ((128, "softsign"), (3, "linear"))),
            MLPHead(88, ((128, "softsign"), (64, "softsign"), (3, "linear"))),
            MLPHead(88, ((32, "softsign"), (3, "linear"))),
            MLPHead(88, ((64, "tanh"), (32, "tanh"), (3, "linear"))),
            MLPHead(88, ((64, "tanh"), (32, "tanh"), (3, "linear"))),  # dup
            SEMLPHead(in_features=88),
            MLPHead(88, ((256, "tanh"), (128, "tanh"), (3, "linear"))),
        )
        W = tuple((0.3 * i - 0.2, 0.1 * i, 0.05 - 0.02 * i)
                  for i in range(len(members)))
        spec = EnsembleHead(members=members, weights=W, bias=(0.1, -0.3, 0.2))
        params = spec.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 2, 2, 88)).astype(np.float32))
        want = sum(np.asarray(m.apply(p, x)) * np.asarray(w, np.float32)
                   for m, p, w in zip(members, params["members"], W)
                   ) + np.asarray(spec.bias)
        np.testing.assert_allclose(np.asarray(spec.apply(params, x)), want,
                                   rtol=2e-6, atol=1e-6)
        # uniform-average ensembles take the same path
        avg = EnsembleHead(members=members)
        want_avg = sum(np.asarray(m.apply(p, x))
                       for m, p in zip(members, params["members"])
                       ) / len(members)
        np.testing.assert_allclose(np.asarray(avg.apply(params, x)),
                                   want_avg, rtol=2e-6, atol=1e-6)

    def test_unhashable_members_still_group(self):
        """Members are typed by PROTOCOL, not base class — a non-frozen
        dataclass head (whose __hash__ is None) must still serve through
        the grouped inference path (which therefore groups by value
        equality with a linear scan, never by hashing)."""
        import dataclasses

        @dataclasses.dataclass
        class _PlainHead:
            in_features: int = 88

            def init(self, key):
                return {"w": jnp.asarray(np.random.default_rng(0).normal(
                    size=(self.in_features, 3)).astype(np.float32))}

            def apply(self, params, x, *, train=False, rng=None):
                return x @ params["w"]

            def l2_penalty(self, params, rate):
                return 0.0

        a, b = _PlainHead(), _PlainHead()
        with pytest.raises(TypeError):
            hash(a)  # the regression precondition: eq=True dataclass
        assert a == b and a is not b
        spec = EnsembleHead(members=(a, b, MLPHead(88, ((3, "linear"),))))
        params = spec.init(jax.random.PRNGKey(2))
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(6, 88)).astype(np.float32))
        want = sum(np.asarray(m.apply(p, x))
                   for m, p in zip(spec.members, params["members"])) / 3
        np.testing.assert_allclose(np.asarray(spec.apply(params, x)),
                                   want, rtol=2e-6, atol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError, match="at least one"):
            EnsembleHead(members=())
        with pytest.raises(ValueError, match="in_features"):
            EnsembleHead(members=(MLPHead(88, ((3, "linear"),)),
                                  MLPHead(96, ((3, "linear"),))))

    def test_l2_is_member_sum(self):
        spec, params = self._mixed()
        want = sum(float(m.l2_penalty(p, 1e-3))
                   for m, p in zip(spec.members, params["members"]))
        assert np.isclose(float(spec.l2_penalty(params, 1e-3)), want)
        assert spec.l2_penalty(params, 0.0) == 0.0

    def test_native_serialization_roundtrip(self, tmp_path):
        from headpose_tpu.tools.export import load_model, save_model

        spec, params = self._mixed()
        save_model(str(tmp_path / "ens"), spec, params)
        spec2, params2 = load_model(str(tmp_path / "ens"))
        assert spec2 == spec
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(4, 2, 2, 88)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spec2.apply(params2, x)),
                                   np.asarray(spec.apply(params, x)),
                                   atol=1e-6)

    def test_stacked_weights_and_bias(self):
        """weights/bias turn the average into a stacked combination:
        y = sum_k w_k * f_k(x) + b (per yaw/pitch/roll output).  The fields
        are static spec metadata — they serialize in spec.json and bake
        into the compiled program (scripts/stack_ensemble.py fits them)."""
        base, params = self._mixed()
        W = ((0.7, -0.1, 0.4), (0.5, 1.2, 0.6), (-0.2, 0.3, 0.1))
        B = (0.3, -0.2, 0.1)
        spec = EnsembleHead(members=base.members, weights=W, bias=B)
        x = jnp.asarray(np.random.default_rng(3).normal(
            size=(5, 2, 2, 88)).astype(np.float32))
        want = sum(np.asarray(m.apply(p, x)) * np.asarray(w)
                   for m, p, w in zip(spec.members, params["members"], W)
                   ) + np.asarray(B)
        np.testing.assert_allclose(np.asarray(spec.apply(params, x)),
                                   want, atol=1e-5)

    def test_stacked_validation(self):
        m = (MLPHead(88, ((3, "linear"),)), MLPHead(88, ((3, "linear"),)))
        with pytest.raises(ValueError, match="weight rows"):
            EnsembleHead(members=m, weights=((1.0, 1.0, 1.0),))
        with pytest.raises(ValueError, match="yaw, pitch, roll"):
            EnsembleHead(members=m, weights=((1.0,), (1.0,)))
        with pytest.raises(ValueError, match="bias requires weights"):
            EnsembleHead(members=m, bias=(0.0, 0.0, 0.0))

    def test_stacked_serialization_roundtrip(self, tmp_path):
        from headpose_tpu.tools.export import load_model, save_model

        base, params = self._mixed()
        spec = EnsembleHead(members=base.members,
                            weights=((1.0, 0.5, 0.2),) * 3,
                            bias=(0.1, 0.0, -0.1))
        save_model(str(tmp_path / "st"), spec, params)
        spec2, params2 = load_model(str(tmp_path / "st"))
        assert spec2 == spec
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(4, 88)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(spec2.apply(params2, x)),
                                   np.asarray(spec.apply(params, x)),
                                   atol=1e-6)

    def test_joint_training_fits(self):
        """The ensemble satisfies the head protocol end-to-end: train.fit
        optimizes all members jointly (dropout rngs fold per member)."""
        from headpose_tpu.data import Dataset
        from headpose_tpu.train import TrainConfig, fit

        rng = np.random.default_rng(2)
        x = rng.normal(size=(128, 16)).astype(np.float32)
        w = rng.normal(size=(16, 3)).astype(np.float32)
        ds = Dataset(x, x @ w)
        spec = EnsembleHead(members=(
            MLPHead(16, ((8, "tanh"), (3, "linear")), dropout_rate=0.1),
            MLPHead(16, ((3, "linear"),))))
        cfg = TrainConfig(in_features=16, total_epochs=40, batch_size=32,
                          learning_rate=1e-2, optimizer="adam",
                          early_stopping_patience=40)
        res = fit(cfg, ds, spec=spec)
        assert np.isfinite(res.best_val_loss)
        first = float(res.history[0]["val_loss"])
        assert res.best_val_loss < first


def test_back_camera_anchor_config():
    """The back-camera anchor table (256 input, strides 16/32/32/32 —
    blazeFaceDetectorH5.py INPUT_BACK) is bit-exact vs the reference
    generator run with the back options (golden anchors_back.npz, captured
    from blazeFaceUtils.gen_anchors)."""
    from headpose_tpu.models.anchors import BACK_CONFIG
    a = generate_anchors(BACK_CONFIG)
    assert a.shape == (896, 4)
    assert np.isclose(a[0, 0], 0.5 / 16)   # 16x16 grid, 2/cell
    assert np.isclose(a[512, 0], 0.5 / 8)  # 8x8 grid, 6/cell
    golden = np.load(os.path.join(GOLDEN, "anchors_back.npz"))["anchors"]
    np.testing.assert_array_equal(a, golden)


@pytest.mark.heavy  # 34s; back topology also certified on-chip (certify_back)
def test_back_camera_backbone_and_detector():
    """BLAZEFACE_BACK: 256-input spec with one extra downsample stage —
    feature grids and anchor-major outputs line up with the back anchor
    table, and the full detection pipeline runs end to end on it."""
    from headpose_tpu.models import BLAZEFACE_BACK
    from headpose_tpu.models.heads import MLPHead
    from headpose_tpu.models.unified import join_models
    from headpose_tpu.runtime.detector import FaceDetector

    spec = BLAZEFACE_BACK
    key = jax.random.PRNGKey(0)
    params = spec.init(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 256, 3),
                           jnp.float32, -1.0, 1.0)
    out = spec.apply(params, x)
    assert out["feat88"].shape == (2, 16, 16, 88)
    assert out["feat96"].shape == (2, 8, 8, 96)
    assert out["scores"].shape == (2, 896)
    assert out["loc"].shape == (2, 896, 16)
    # dense composition stays exact on the back topology too
    out_d = spec.apply(params, x, dense=True)
    np.testing.assert_allclose(np.asarray(out_d["scores"]),
                               np.asarray(out["scores"]), rtol=2e-4, atol=2e-4)

    h88 = MLPHead(88, ((16, "softsign"), (3, "linear")))
    h96 = MLPHead(96, ((16, "tanh"), (3, "linear")))
    model, uparams = join_models(spec, params,
                                 h88, h88.init(jax.random.PRNGKey(2)),
                                 h96, h96.init(jax.random.PRNGKey(3)))
    # input_size derives from the model's backbone spec (256 here) — no
    # redundant constructor arg needed
    det = FaceDetector(model, uparams, score_threshold=0.0)
    assert det.input_size == 256
    imgs = np.random.default_rng(4).integers(
        0, 256, size=(2, 300, 300, 3)).astype(np.uint8)
    batch = det.detect(imgs)
    assert batch.boxes.shape[0] == 2
    assert np.all(np.isfinite(np.asarray(batch.poses)))


def test_mlp_import_rejects_flattened_spatial_input(tmp_path):
    """A Flatten of a >1x1 spatial input feeding Dense is NOT a per-cell MLP
    chain: the kernel input dim disagrees with the channel count, and the
    importer must fail loud instead of returning a spec whose init() shape
    disagrees with the imported weights (round-3 review fix)."""
    keras = pytest.importorskip("tf_keras")
    from headpose_tpu.models.heads import head_from_h5
    inp = keras.Input(shape=(2, 2, 88))
    x = keras.layers.Flatten()(inp)
    out = keras.layers.Dense(3)(x)
    path = str(tmp_path / "flat_spatial.h5")
    keras.Model(inp, out).save(path)
    with pytest.raises(ValueError, match="input features"):
        head_from_h5(path)
