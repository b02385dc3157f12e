"""Parity tests: the H5 graph compiler vs golden outputs captured from the
reference TF/Keras implementation (scripts/capture_goldens.py).

Mirrors the reference's own validation style — numeric equivalence within
float tolerance (Model-96/InputShapeConvertor.py:129-218 used
np.allclose(rtol=1e-5, atol=1e-5) as its acceptance bar).
"""
import os

import numpy as np
import pytest

from headpose_tpu.core import load_graph_model, read_model

from conftest import REFERENCE_ROOT, has_reference

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

needs_reference = pytest.mark.skipif(
    not has_reference(), reason="reference artifacts not mounted")


def _ref(*parts):
    return os.path.join(REFERENCE_ROOT, *parts)


@needs_reference
class TestHeadParity:
    def test_hrchr82r_head(self):
        g = np.load(os.path.join(GOLDEN, "heads.npz"))
        m = load_graph_model(
            _ref("Model-96", "Trained-Models-96-ReshapedInput-NoFlatten", "hrchr82r.h5"))
        assert m.param_count == 3683  # BASELINE.md model-size table
        y = np.asarray(m(g["x96"]))
        np.testing.assert_allclose(y, g["y96"], rtol=1e-4, atol=1e-4)

    def test_hrchr82r_spatial_map(self):
        """Heads are fully convolutional: the same params must work on 8x8 maps."""
        g = np.load(os.path.join(GOLDEN, "heads.npz"))
        m = load_graph_model(
            _ref("Model-96", "Trained-Models-96-ReshapedInput-NoFlatten", "hrchr82r.h5"))
        y = np.asarray(m(g["xmap96"]))
        assert y.shape == (2, 8, 8, 3)
        np.testing.assert_allclose(y, g["ymap96"], rtol=1e-4, atol=1e-4)

    def test_stoqa9pt_head(self):
        g = np.load(os.path.join(GOLDEN, "heads.npz"))
        m = load_graph_model(_ref("Model-88", "Trained-Models-88", "stoqa9pt.h5"))
        assert m.param_count == 5891
        y = np.asarray(m(g["x88"]))
        np.testing.assert_allclose(y, g["y88"], rtol=1e-4, atol=1e-4)

    def test_fixed_shape_head_with_flatten(self):
        """Original Trained-Models-96 heads (pre-conversion, with Flatten) load too."""
        m = load_graph_model(
            _ref("Model-96", "Trained-Models-96", "model_runid_hrchr82r.h5"))
        x = np.random.default_rng(0).normal(size=(4, 1, 1, 96)).astype(np.float32)
        y = np.asarray(m(x))
        assert y.shape == (4, 3)  # Flatten collapses the 1x1 map

        # must agree with the converted (NoFlatten) variant — this is exactly
        # the numeric-equivalence contract of InputShapeConvertor.validate_conversion
        m2 = load_graph_model(
            _ref("Model-96", "Trained-Models-96-ReshapedInput-NoFlatten", "hrchr82r.h5"))
        y2 = np.asarray(m2(x)).reshape(4, 3)
        np.testing.assert_allclose(y, y2, rtol=1e-5, atol=1e-5)


@needs_reference
class TestUnifiedParity:
    def test_unified_forward_batched(self):
        """The unified 6-output contract (JoinModels.py:152-158), run BATCHED —
        the reference H5 is hardwired to batch 1; ours accepts any batch."""
        g = np.load(os.path.join(GOLDEN, "unified_forward.npz"))
        m = load_graph_model(
            _ref("BlazePoser", "UnifiedModels", "reg1-stoqa9pt-reg2-hrchr82r-selected.h5"))
        assert m.param_count == 110964  # BASELINE.md
        outs = m(g["inputs"])
        expected_shapes = [(4, 512, 1), (4, 384, 1), (4, 512, 16),
                           (4, 384, 16), (4, 16, 16, 3), (4, 8, 8, 3)]
        assert len(outs) == 6
        for i, (o, shape) in enumerate(zip(outs, expected_shapes)):
            o = np.asarray(o)
            assert o.shape == shape
            np.testing.assert_allclose(o, g[f"out{i}"], rtol=1e-3, atol=2e-4)

    def test_reads_all_unified_models(self):
        d = _ref("BlazePoser", "UnifiedModels")
        for fn in os.listdir(d):
            md = read_model(os.path.join(d, fn))
            assert len(md.outputs) == 6


@needs_reference
def test_artifact_zoo_loads():
    """Spot-check a sample across all three artifact families parses + runs."""
    rng = np.random.default_rng(0)
    dirs = [
        (_ref("Model-88", "Trained-Models-88"), (2, 1, 1, 88)),
        (_ref("Model-96", "Trained-Models-96-ReshapedInput-NoFlatten"), (2, 1, 1, 96)),
        (_ref("Model-96", "Trained-Models-96"), (2, 1, 1, 96)),
    ]
    for d, in_shape in dirs:
        files = sorted(os.listdir(d))[:3]
        for fn in files:
            m = load_graph_model(os.path.join(d, fn))
            x = rng.normal(size=in_shape).astype(np.float32)
            y = np.asarray(m(x))
            assert np.isfinite(y).all(), fn


@needs_reference
@pytest.mark.slow
def test_entire_artifact_zoo_loads_and_runs():
    """Every one of the ~688 shipped H5 artifacts compiles and runs batched.
    (Marked slow: ~3 minutes on the container CPU; run with -m slow.)"""
    import glob

    files = sorted(glob.glob(os.path.join(REFERENCE_ROOT, "**", "*.h5"),
                             recursive=True))
    assert len(files) > 600
    for f in files:
        m = load_graph_model(f)
        md = m.definition
        in_layer = md.layers[md.inputs[0][0]]
        shape = in_layer.config.get("batch_input_shape")
        shape = [2] + [int(s) if s else 4 for s in shape[1:]]
        y = m(np.zeros(shape, np.float32))
        leaves = y if isinstance(y, tuple) else (y,)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves), f


@needs_reference
@pytest.mark.heavy  # 32s; the full-zoo sweep lives in the slow lane
def test_zoo_sample_numeric_parity():
    """12 randomly sampled zoo heads (4 per artifact family) match their
    tf-keras outputs (goldens in tests/golden/zoo_heads.npz)."""
    g = np.load(os.path.join(GOLDEN, "zoo_heads.npz"))
    for tag in g["names"]:
        path = str(g[f"path_{tag}"])
        m = load_graph_model(path)
        y = np.asarray(m(g[f"x_{tag}"]))
        ref = g[f"y_{tag}"]
        np.testing.assert_allclose(y.reshape(ref.shape), ref,
                                   rtol=1e-4, atol=1e-4, err_msg=tag)


class TestSharedLayersAndTFOpLambda:
    """Round-2 graph-compiler extensions: multi-call (shared) layers execute
    once per call node, and TFOpLambda ops (the TF2 successor of
    TensorFlowOpLayer) evaluate with their saved scalar kwargs.  Fixtures
    are built with tf-keras in-test (no zoo artifact uses these — this is
    capability beyond the shipped 688 files)."""

    @pytest.fixture(scope="class")
    def fixture_h5(self, tmp_path_factory):
        keras = pytest.importorskip("tf_keras")
        path = str(tmp_path_factory.mktemp("shared") / "shared_tfop.h5")
        inp = keras.Input(shape=(4,))
        shared = keras.layers.Dense(4, activation="tanh", name="shared")
        a = shared(inp)
        b = shared(a)                 # second call node of the same layer
        c = a * 2.0 + 1.0             # TFOpLambda with scalar kwargs
        d = keras.layers.Concatenate()([b, c])
        m = keras.Model(inp, d)
        m.save(path)
        x = np.random.default_rng(0).normal(size=(6, 4)).astype(np.float32)
        return path, x, m.predict(x, verbose=0)

    def test_numeric_parity(self, fixture_h5):
        path, x, want = fixture_h5
        gm = load_graph_model(path)
        np.testing.assert_allclose(np.asarray(gm(x)), want,
                                   rtol=1e-5, atol=1e-6)


class TestDilationGeluKwargsFixes:
    """Round-3 graph-compiler review fixes, each a silent-wrong-values class:
    dilated convolutions (dilation_rate was dropped), tf-keras's exact-erf
    gelu (jax.nn.gelu defaults to the tanh approximation), n-ary Multiply,
    and non-tensor call kwargs surviving h5 deserialization (reduce_mean's
    axis/keepdims, concat's axis; without them tf.concat silently falls back
    to axis 0).  Fixtures are built with tf-keras in-test, like
    TestSharedLayersAndTFOpLambda above."""

    @pytest.fixture(scope="class")
    def fixture_h5(self, tmp_path_factory):
        keras = pytest.importorskip("tf_keras")
        import tensorflow as tf
        path = str(tmp_path_factory.mktemp("dil") / "dilation_kwargs.h5")
        inp = keras.Input(shape=(16, 16, 4))
        a = keras.layers.Conv2D(8, 3, dilation_rate=2, padding="same",
                                activation="gelu")(inp)
        b = keras.layers.DepthwiseConv2D(3, dilation_rate=(2, 2),
                                         padding="same", activation="relu")(a)
        c = keras.layers.SeparableConv2D(8, 3, dilation_rate=2,
                                         padding="same")(b)
        m3 = keras.layers.Multiply()([a, b, c])          # 3-input multiply
        r = tf.math.reduce_mean(m3, axis=[1, 2], keepdims=True)
        s = tf.math.add(m3, y=r)                         # tensor-valued kwarg
        cat = tf.concat([s, c], axis=3)                  # scalar axis kwarg
        m = keras.Model(inp, cat)
        m.save(path)
        x = np.random.default_rng(3).normal(size=(2, 16, 16, 4)).astype(np.float32)
        return path, x, m.predict(x, verbose=0)

    def test_numeric_parity(self, fixture_h5):
        path, x, want = fixture_h5
        gm = load_graph_model(path)
        got = np.asarray(gm(x))
        assert got.shape == want.shape
        # atol well below the ~1e-3 erf-vs-tanh gelu divergence, so the
        # approximate-gelu regression cannot slip back in
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-6)

    def test_non_last_axis_batchnorm_fails_loud(self, tmp_path):
        """The compiler normalizes over the last axis only; any other saved
        axis must raise, not silently broadcast wrong."""
        keras = pytest.importorskip("tf_keras")
        inp = keras.Input(shape=(6, 5))
        out = keras.layers.BatchNormalization(axis=1)(inp)
        path = str(tmp_path / "bn_axis1.h5")
        keras.Model(inp, out).save(path)
        with pytest.raises(NotImplementedError, match="axis"):
            gm = load_graph_model(path)
            gm(np.zeros((2, 6, 5), np.float32))


class TestGapKeepdims:
    """GlobalAveragePooling2D(keepdims=True) must keep (B,1,1,C) — the
    SE-gate pattern multiplies it straight back into the feature map, so
    silently returning (B,C) broadcasts wrong (round-3 review fix)."""

    def test_keepdims_se_gate_parity(self, tmp_path):
        keras = pytest.importorskip("tf_keras")
        inp = keras.Input(shape=(8, 8, 6))
        g = keras.layers.GlobalAveragePooling2D(keepdims=True)(inp)
        g = keras.layers.Conv2D(6, 1, activation="sigmoid")(g)
        out = keras.layers.Multiply()([inp, g])
        m = keras.Model(inp, out)
        path = str(tmp_path / "gap_keepdims.h5")
        m.save(path)
        x = np.random.default_rng(11).normal(size=(3, 8, 8, 6)).astype(np.float32)
        want = m.predict(x, verbose=0)
        got = np.asarray(load_graph_model(path)(x))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestParseInbound:
    """Direct contract tests for h5io._parse_inbound over the three on-disk
    inbound formats (docstring there) — synthetic structures, no tf-keras
    needed, covering shapes the shipped zoo never exercises."""

    def _parse(self, raw):
        from headpose_tpu.core.h5io import _parse_inbound
        return _parse_inbound(raw)

    def test_flat_call_scalar_and_tensor_kwargs(self):
        raw = [["prev", 0, 0, {"axis": 3, "y": ["other", 1, 2],
                               "name": "ignored", "skipme": None}]]
        nodes, kwargs = self._parse(raw)
        assert nodes == [[("prev", 0, 0), ("other", 1, 2)]]
        assert kwargs == [{"axis": 3}]

    def test_classic_nested_with_replicated_item_kwargs(self):
        # tf.concat saves the same kwargs dict on EVERY positional item
        raw = [[["a", 0, 0, {"axis": 3}], ["b", 0, 0, {"axis": 3}]]]
        nodes, kwargs = self._parse(raw)
        assert nodes == [[("a", 0, 0), ("b", 0, 0)]]
        assert kwargs == [{"axis": 3}]

    def test_tensor_kwarg_lands_after_all_positionals(self):
        # the kwarg ref must not interleave between positional refs even
        # though item 1 carries the (replicated) kwargs dict
        raw = [[["a", 0, 0, {"y": ["kw", 0, 0]}],
                ["b", 0, 0, {"y": ["kw", 0, 0]}]]]
        nodes, _ = self._parse(raw)
        assert nodes == [[("a", 0, 0), ("b", 0, 0), ("kw", 0, 0)]]

    def test_numeric_list_kwarg_is_not_a_ref(self):
        # axis=[1,2] and a 3-long numeric list must stay kwargs, not become
        # phantom inbound refs
        raw = [["prev", 0, 0, {"axis": [1, 2], "shape": [1, 2, 3]}]]
        nodes, kwargs = self._parse(raw)
        assert nodes == [[("prev", 0, 0)]]
        assert kwargs == [{"axis": [1, 2], "shape": [1, 2, 3]}]

    def test_dict_style_list_valued_arg(self):
        # newer keras dict nodes: tf.concat's tensor LIST arg
        kt = lambda n: {"class_name": "__keras_tensor__",
                        "config": {"keras_history": [n, 0, 0]}}
        raw = [[{"args": [[kt("a"), kt("b")]], "kwargs": {"axis": -1}}]]
        nodes, kwargs = self._parse(raw)
        assert nodes == [[("a", 0, 0), ("b", 0, 0)]]
        assert kwargs == [{"axis": -1}]

    def test_dict_style_tensor_kwarg(self):
        kt = {"class_name": "__keras_tensor__",
              "config": {"keras_history": ["kw", 0, 0]}}
        raw = [[{"args": [{"config": {"keras_history": ["a", 0, 0]}}],
                 "kwargs": {"y": kt}}]]
        nodes, kwargs = self._parse(raw)
        assert nodes == [[("a", 0, 0), ("kw", 0, 0)]]
        assert kwargs == [{}]


class TestKeras3LegacyH5:
    """Keras 3's legacy-H5 writer diverges from tf-keras in three ways the
    parser now normalizes: bare [name, node, idx] triples for single-entry
    ref lists, call nodes as one kwargs-style dict (not a list of items),
    and 'kernel' (not 'depthwise_kernel') for depthwise filters — plus
    'batch_shape' replacing 'batch_input_shape'.  A reference user migrating
    to Keras 3 can keep loading their H5s through this compiler."""

    @pytest.fixture(scope="class")
    def fixture_h5(self, tmp_path_factory):
        keras3 = pytest.importorskip("keras")
        if not keras3.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        path = str(tmp_path_factory.mktemp("k3") / "k3.h5")
        inp = keras3.Input(shape=(16, 16, 4))
        a = keras3.layers.Conv2D(8, 3, padding="same", activation="gelu",
                                 dilation_rate=2)(inp)
        b = keras3.layers.DepthwiseConv2D(3, padding="same",
                                          activation="relu")(a)
        c = keras3.layers.BatchNormalization()(b)
        d = keras3.layers.SeparableConv2D(8, 3, padding="same")(c)
        g = keras3.layers.GlobalAveragePooling2D(keepdims=True)(d)
        g = keras3.layers.Conv2D(8, 1, activation="sigmoid")(g)
        e = keras3.layers.Multiply()([d, g])
        out = keras3.layers.Conv2D(3, 1)(e)
        m = keras3.Model(inp, out)
        m.save(path)
        x = np.random.default_rng(9).normal(size=(2, 16, 16, 4)).astype(np.float32)
        return path, x, m.predict(x, verbose=0)

    def test_numeric_parity(self, fixture_h5):
        path, x, want = fixture_h5
        gm = load_graph_model(path)
        got = np.asarray(gm(x))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_head_import(self, tmp_path):
        """head_from_h5 reads Keras 3's batch_shape InputLayer config."""
        keras3 = pytest.importorskip("keras")
        if not keras3.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        from headpose_tpu.models.heads import head_from_h5
        inp = keras3.Input(shape=(96,))
        h = keras3.layers.Dense(32, activation="tanh")(inp)
        out = keras3.layers.Dense(3)(h)
        path = str(tmp_path / "head_k3.h5")
        keras3.Model(inp, out).save(path)
        spec, params = head_from_h5(path)
        assert spec.in_features == 96
        x = np.random.default_rng(0).normal(size=(4, 96)).astype(np.float32)
        got = np.asarray(spec.apply(params, x))
        assert got.shape == (4, 3)


class TestKeras3NativeArchive:
    """Keras 3's native .keras zip (config.json + positional weight store):
    same graph dialect as its legacy H5, different weight layout
    (layers/<name>/vars/0..N) — mapped back to names per class with the
    flag-dependent variables (use_bias, scale, center) resolved from the
    saved config."""

    def test_numeric_parity(self, tmp_path):
        keras3 = pytest.importorskip("keras")
        if not keras3.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        # bump the global name counters so config names (conv2d_7, ...) and
        # the store's per-save class-counter names (conv2d, ...) diverge —
        # the reader must not match groups by layer.name
        _ = keras3.layers.Conv2D(2, 1)(keras3.Input(shape=(4, 4, 2)))
        inp = keras3.Input(shape=(12, 12, 4))
        a = keras3.layers.Conv2D(8, 3, padding="same", use_bias=False,
                                 activation="relu")(inp)
        b = keras3.layers.BatchNormalization(scale=False)(a)  # 3 vars only
        c = keras3.layers.SeparableConv2D(8, 3, padding="same")(b)
        d = keras3.layers.DepthwiseConv2D(3, padding="same")(c)
        g = keras3.layers.GlobalAveragePooling2D(keepdims=True)(d)
        g = keras3.layers.Dense(8, activation="sigmoid")(g)
        e = keras3.layers.Multiply()([d, g])
        out = keras3.layers.Conv2D(3, 1)(e)
        m = keras3.Model(inp, out)
        path = str(tmp_path / "m.keras")
        m.save(path)
        x = np.random.default_rng(4).normal(size=(2, 12, 12, 4)).astype(np.float32)
        want = m.predict(x, verbose=0)
        got = np.asarray(load_graph_model(path)(x))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_mha_sublayer_weights_attached(self, tmp_path):
        """The .keras store keeps MultiHeadAttention's variables in SUBLAYER
        groups (query_dense/key_dense/value_dense/output_dense), not a flat
        'vars' — the reader must map them to the compiler's path-style keys
        instead of silently loading the layer empty."""
        keras3 = pytest.importorskip("keras")
        if not keras3.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        inp = keras3.Input(shape=(6, 16))
        a = keras3.layers.MultiHeadAttention(num_heads=2, key_dim=8)(inp, inp)
        a = keras3.layers.LayerNormalization()(inp + a)
        out = keras3.layers.Dense(3)(a)
        m = keras3.Model(inp, out)
        path = str(tmp_path / "mha.keras")
        m.save(path)
        md = read_model(path)
        mha = next(l for l in md.layers.values()
                   if l.class_name == "MultiHeadAttention")
        assert set(mha.weights) == {
            "query/kernel", "query/bias", "key/kernel", "key/bias",
            "value/kernel", "value/bias", "attention_output/kernel",
            "attention_output/bias"}
        x = np.random.default_rng(6).normal(size=(2, 6, 16)).astype(np.float32)
        want = m.predict(x, verbose=0)
        got = np.asarray(load_graph_model(path)(x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestNestedSubmodelNodeNumbering:
    """tf-keras and Keras 3 number a nested Functional's OUTER call nodes
    differently (tf-keras from 1 — the inner graph's construction is node 0;
    Keras 3 from 0).  The compiler keys produced values per dialect
    (ModelDef.keras3); a twice-called submodel makes a wrong base mis-wire
    (or fail to resolve) the second call."""

    @staticmethod
    def _build(keras):
        si = keras.Input(shape=(8,), name="sub_in")
        sub = keras.Model(si, keras.layers.Dense(8, activation="tanh",
                                                 name="sd")(si), name="subnet")
        oi = keras.Input(shape=(8,), name="outer_in")
        y = sub(oi)
        y2 = sub(y)  # second call: refs ("subnet", base+1, 0)
        out = keras.layers.Dense(3, name="od")(y2)
        return keras.Model(oi, out)

    def _roundtrip(self, m, path):
        m.save(path)
        x = np.random.default_rng(11).normal(size=(4, 8)).astype(np.float32)
        want = m.predict(x, verbose=0)
        got = np.asarray(load_graph_model(path)(x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("suffix", ["h5", "keras"])
    def test_keras3_both_formats(self, tmp_path, suffix):
        keras3 = pytest.importorskip("keras")
        if not keras3.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        self._roundtrip(self._build(keras3), str(tmp_path / f"n.{suffix}"))

    def test_tfkeras_control(self, tmp_path):
        keras2 = pytest.importorskip("tf_keras")
        self._roundtrip(self._build(keras2), str(tmp_path / "n2.h5"))


class TestCrossAttention:
    """MultiHeadAttention with distinct query/value/key tensors — the call
    refs must map to the (query, value, key) call signature no matter how
    the writer serialized them (tf-keras: positional q + value=/key= kwarg
    refs in USER order; Keras 3: three positional args)."""

    @staticmethod
    def _assert_parity(m, path, shapes, seed=13):
        m.save(path)
        rng = np.random.default_rng(seed)
        xs = [rng.normal(size=s).astype(np.float32) for s in shapes]
        want = m.predict(xs, verbose=0)
        got = np.asarray(load_graph_model(path)(*xs))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("kwarg_order", ["value_first", "key_first"])
    def test_tfkeras_three_inputs(self, tmp_path, kwarg_order):
        keras = pytest.importorskip("tf_keras")
        q = keras.Input((6, 16)); v = keras.Input((4, 16)); k = keras.Input((4, 16))
        mha = keras.layers.MultiHeadAttention(num_heads=2, key_dim=8)
        # key= before value= makes tf-keras serialize the kwargs dict in
        # that order — the parser must still bind value to the value slot
        a = (mha(q, value=v, key=k) if kwarg_order == "value_first"
             else mha(q, key=k, value=v))
        m = keras.Model([q, v, k], keras.layers.Dense(3)(a))
        self._assert_parity(m, str(tmp_path / "x.h5"),
                            [(2, 6, 16), (2, 4, 16), (2, 4, 16)])

    @pytest.mark.parametrize("suffix", ["h5", "keras"])
    def test_keras3_three_inputs(self, tmp_path, suffix):
        keras3 = pytest.importorskip("keras")
        if not keras3.__version__.startswith("3"):
            pytest.skip("stock keras is not Keras 3 here")
        q = keras3.Input((6, 16)); v = keras3.Input((4, 16)); k = keras3.Input((4, 16))
        a = keras3.layers.MultiHeadAttention(num_heads=2, key_dim=8)(q, v, k)
        m = keras3.Model([q, v, k], keras3.layers.Dense(3)(a))
        self._assert_parity(m, str(tmp_path / f"x.{suffix}"),
                            [(2, 6, 16), (2, 4, 16), (2, 4, 16)])

    def test_tfkeras_cross_two_inputs(self, tmp_path):
        """q != v, key defaulting to value (the layer's own contract)."""
        keras = pytest.importorskip("tf_keras")
        q = keras.Input((6, 16)); v = keras.Input((4, 16))
        a = keras.layers.MultiHeadAttention(num_heads=2, key_dim=8)(q, v)
        m = keras.Model([q, v], keras.layers.Dense(3)(a))
        self._assert_parity(m, str(tmp_path / "c.h5"),
                            [(2, 6, 16), (2, 4, 16)])
