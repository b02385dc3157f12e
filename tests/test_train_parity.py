"""Training-semantics parity: our optimizer step reproduces Keras's training
trajectory step-for-step.

Golden: a 96→8 tanh→3 conv head with L2(1e-3) on kernels+biases, fixed
initial weights, full-batch (shuffle-free) fit for 6 epochs under SGD(0.01)
and Adam(0.01) — losses captured from tf-keras (scripts: see
tests/golden/keras_train_traj.npz provenance in git history).  Keras reports
total loss (MSE + regularization) evaluated before each epoch's update; we
replay the same schedule with our loss/optimizer stack and compare.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from headpose_tpu.models import MLPHead
from headpose_tpu.train import TrainConfig, make_optimizer
from headpose_tpu.train.loop import _loss_and_metrics

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.mark.parametrize("opt_name", ["sgd", "adam"])
def test_trajectory_matches_keras(opt_name):
    g = np.load(os.path.join(GOLDEN, "keras_train_traj.npz"))
    spec = MLPHead(96, ((8, "tanh"), (3, "linear")))
    params = {"layers": [
        {"w": jnp.asarray(g["w0_k0"][0, 0]), "b": jnp.asarray(g["w0_b0"])},
        {"w": jnp.asarray(g["w0_k1"][0, 0]), "b": jnp.asarray(g["w0_b1"])},
    ]}
    batch = {"x": jnp.asarray(g["x"].reshape(-1, 96)),
             "y": jnp.asarray(g["y"].reshape(-1, 3)),
             "w": jnp.ones((g["x"].shape[0],)),
             "mask": jnp.ones((g["x"].shape[0],))}

    cfg = TrainConfig(optimizer=opt_name, learning_rate=0.01,
                      regularizer_rate=1e-3)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: _loss_and_metrics(spec, p, batch, None, 1e-3, False),
            has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    losses, maes = [], []
    for _ in range(6):
        params, opt_state, loss, metrics = step(params, opt_state)
        losses.append(float(loss))       # total loss incl. L2, pre-update
        maes.append(float(metrics["mae"]))

    np.testing.assert_allclose(losses, g[f"loss_{opt_name}"], rtol=1e-4,
                               err_msg=f"{opt_name} loss trajectory")
    np.testing.assert_allclose(maes, g[f"mae_{opt_name}"], rtol=1e-4,
                               err_msg=f"{opt_name} mae trajectory")
