"""Structural fuzz: random Keras models from the graph compiler's layer
vocabulary must compile and match Keras numerically — under EVERY writer the
compiler claims to read (tf-keras H5, Keras 3 legacy H5, Keras 3 native
.keras archives).

The fixtures elsewhere cover the shipped zoo's shapes; this sweeps random
COMBINATIONS (branching, merges, shared weights, mixed activations, dilated
convs, GAP/BN/LN placements) that no shipped artifact exercises.  Seeded —
every run builds the same 8 graphs per writer.  Skips without the relevant
Keras, like the other in-test fixture builders (tests/test_h5_graph.py).
"""
import numpy as np
import pytest

from headpose_tpu.core import load_graph_model


def _keras_for(writer: str):
    if writer == "tfkeras":
        return pytest.importorskip("tf_keras")
    keras3 = pytest.importorskip("keras")
    if not keras3.__version__.startswith("3"):
        pytest.skip("stock keras is not Keras 3 here")
    return keras3


def _random_model(rng: np.random.Generator, keras):
    """A random small functional CNN over the supported layer vocabulary."""
    H = W = int(rng.choice([8, 12, 16]))
    C = int(rng.choice([3, 4, 6]))
    inp = keras.Input(shape=(H, W, C))
    # pool of live tensors with matching spatial dims, keyed by shape
    pool = [inp]

    def act():
        return str(rng.choice(["relu", "tanh", "sigmoid", "softsign",
                               "gelu", "linear", "elu"]))

    n_layers = int(rng.integers(4, 9))
    for _ in range(n_layers):
        x = pool[int(rng.integers(len(pool)))]
        kind = rng.choice(["conv", "dw", "sep", "bn", "ln", "merge",
                           "gap_gate", "pool", "actv"])
        try:
            if kind == "conv":
                k = int(rng.choice([1, 3]))
                dil = int(rng.choice([1, 2])) if k > 1 else 1
                y = keras.layers.Conv2D(int(rng.choice([4, 6, 8])), k,
                                        padding="same", dilation_rate=dil,
                                        activation=act())(x)
            elif kind == "dw":
                y = keras.layers.DepthwiseConv2D(3, padding="same",
                                                 activation=act())(x)
            elif kind == "sep":
                y = keras.layers.SeparableConv2D(int(rng.choice([4, 8])), 3,
                                                 padding="same")(x)
            elif kind == "bn":
                y = keras.layers.BatchNormalization()(x)
            elif kind == "ln":
                y = keras.layers.LayerNormalization()(x)
            elif kind == "merge":
                mates = [t for t in pool if t.shape[1:] == x.shape[1:]
                         and t is not x]
                if not mates:
                    continue
                other = mates[int(rng.integers(len(mates)))]
                layer = rng.choice([keras.layers.Add, keras.layers.Multiply,
                                    keras.layers.Average,
                                    keras.layers.Concatenate])
                y = layer()([x, other])
            elif kind == "gap_gate":
                g = keras.layers.GlobalAveragePooling2D(keepdims=True)(x)
                g = keras.layers.Conv2D(x.shape[-1], 1,
                                        activation="sigmoid")(g)
                y = keras.layers.Multiply()([x, g])
            elif kind == "pool":
                if x.shape[1] < 4:
                    continue
                y = keras.layers.MaxPooling2D(2)(x)
            else:
                y = keras.layers.Activation(act())(x)
        except Exception:
            continue  # incompatible sample (e.g. BN after BN oddity) — reroll
        pool.append(y)

    # regression tail so every graph ends in a deterministic small output
    out = keras.layers.Conv2D(3, 1)(pool[-1])
    return keras.Model(inp, out), (H, W, C)


@pytest.mark.parametrize("writer", ["tfkeras", "keras3_h5", "keras3_archive"])
@pytest.mark.parametrize("seed", range(8))
def test_random_graph_matches_keras(tmp_path, seed, writer):
    keras = _keras_for(writer)
    rng = np.random.default_rng(1000 + seed)
    m, (H, W, C) = _random_model(rng, keras)
    suffix = "keras" if writer == "keras3_archive" else "h5"
    path = str(tmp_path / f"fuzz{seed}.{suffix}")
    m.save(path)
    x = rng.normal(size=(2, H, W, C)).astype(np.float32)
    want = m.predict(x, verbose=0)
    gm = load_graph_model(path)
    got = np.asarray(gm(x))
    assert got.shape == want.shape, f"seed {seed}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5,
                               err_msg=f"seed {seed} writer {writer}")
