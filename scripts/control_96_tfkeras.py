"""Trainer-outcome control experiment (96 family): same data, same recipe,
reference tf-keras `model.fit` vs our JAX `fit`.

Settles whether our ~14-deg AFLW2000 MAE on the shipped Enlarged training
data is a data artifact or a trainer gap: trains the reference's own
create_model (/root/reference/Model-96/train_96.py:65-110) with the
reference protocol (:113-209 — reshape, 80/20 split seed 42, Adam 2.8e-4,
batch 128, EarlyStopping patience 40 / min_delta 1e-3 / restore-best) on
BIWI_Train_Enlarged_96, evaluates BIWI_Test_Enlarged_96 + AFLW2000_96, and
runs OUR trainer with identical hyperparameters on the identical split.

Writes docs/control96.json.  Run: PYTHONPATH=/root/repo python
scripts/control_96_tfkeras.py  (CPU; tf side takes minutes per config).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

DATA = "/root/reference/FeatureMaps-Datasets"
TRAIN = f"{DATA}/BIWI_Train_Enlarged_features_96_0.7_1.npz"
TEST_BIWI = f"{DATA}/BIWI_Test_Enlarged_features_96_0.7_1.npz"
TEST_AFLW = f"{DATA}/AFLW2000_features_96_0.7_1.npz"

# representative hyperparameter configs (sweep grids of Model-96/sweep.yaml)
CONFIGS = [
    {"num_filters": 64, "dropout_rate": 1e-4, "regularizer_rate": 1e-2},
    {"num_filters": 128, "dropout_rate": 0.0, "regularizer_rate": 0.0},
    {"num_filters": 360, "dropout_rate": 1e-2, "regularizer_rate": 1e-3},
]


def load(path):
    d = np.load(path)
    return d["features"].astype(np.float32), d["poses"].astype(np.float32)


def mae(pred, target):
    return float(np.mean(np.abs(pred.reshape(-1, 3) - target.reshape(-1, 3))))


def run_tf(cfg, xtr, ytr, xval, yval, tests):
    import tf_keras as keras
    import tensorflow as tf

    tf.random.set_seed(42)
    np.random.seed(42)
    reg = keras.regularizers.l2(cfg["regularizer_rate"])
    inputs = keras.Input(shape=(None, None, 96))
    x1 = keras.layers.Conv2D(cfg["num_filters"], 1, padding="same",
                             activation="tanh",
                             kernel_initializer=keras.initializers.GlorotUniform(),
                             kernel_regularizer=reg, bias_regularizer=reg)(inputs)
    x1 = keras.layers.SpatialDropout2D(cfg["dropout_rate"])(x1)
    out = keras.layers.Conv2D(3, 1, padding="same", activation=None,
                              kernel_initializer=keras.initializers.GlorotUniform(),
                              kernel_regularizer=reg, bias_regularizer=reg)(x1)
    out = keras.layers.SpatialDropout2D(cfg["dropout_rate"])(out)
    model = keras.Model(inputs, out)
    model.compile(optimizer=keras.optimizers.Adam(learning_rate=2.8e-4),
                  loss="mse", metrics=["mae"])
    es = keras.callbacks.EarlyStopping(monitor="val_loss", patience=40,
                                       min_delta=1e-3,
                                       restore_best_weights=True)
    t0 = time.time()
    hist = model.fit(xtr.reshape(-1, 1, 1, 96), ytr.reshape(-1, 1, 1, 3),
                     validation_data=(xval.reshape(-1, 1, 1, 96),
                                      yval.reshape(-1, 1, 1, 3)),
                     epochs=10_000, batch_size=128, callbacks=[es], verbose=0)
    res = {"epochs": len(hist.history["loss"]), "seconds": time.time() - t0}
    for name, (xt, yt) in tests.items():
        pred = model.predict(xt.reshape(-1, 1, 1, 96), verbose=0)
        res[name] = mae(pred, yt)
    return res


def run_ours(cfg, xtr, ytr, xval, yval, tests):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from headpose_tpu.data.datasets import Dataset
    from headpose_tpu.train import config_96, fit

    tcfg = config_96(**cfg, total_epochs=10_000)
    t0 = time.time()
    result = fit(tcfg, Dataset(xtr, ytr), val_ds=Dataset(xval, yval),
                 test_sets={k: Dataset(*v) for k, v in tests.items()})
    out = {"epochs": len(result.history), "seconds": time.time() - t0}
    out.update({k: float(v["mae"]) for k, v in result.test_metrics.items()})
    return out


def main():
    xf, yf = load(TRAIN)
    from sklearn.model_selection import train_test_split
    xtr, xval, ytr, yval = train_test_split(xf, yf, test_size=0.2,
                                            random_state=42)
    tests = {"BIWI_Test_Enlarged_96": load(TEST_BIWI),
             "AFLW2000_96": load(TEST_AFLW)}

    results = []
    for cfg in CONFIGS:
        print(f"== config {cfg}")
        tf_res = run_tf(cfg, xtr, ytr, xval, yval, tests)
        print("  tf-keras:", tf_res)
        ours = run_ours(cfg, xtr, ytr, xval, yval, tests)
        print("  ours:    ", ours)
        results.append({"config": cfg, "tf_keras": tf_res, "ours": ours})
        with open("/root/repo/docs/control96.json", "w") as f:
            json.dump(results, f, indent=2)
    print("written docs/control96.json")


if __name__ == "__main__":
    main()
