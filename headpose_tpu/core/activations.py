"""Activation functions shared by the graph compiler and the native model zoo.

One canonical table for the Keras activation names appearing across the
reference artifact zoo (linear/tanh/softsign/elu/relu/sigmoid/selu/softplus/
swish/leaky_relu/gelu) — Keras semantics.  Note the 'leaky_relu' ACTIVATION
string defaults to alpha=0.2 in tf-keras (the LeakyReLU LAYER would default
to 0.3) — value-verified against the zoo goldens (88_yu8tzyf8).
"""
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["ACTIVATIONS", "get_activation"]

ACTIVATIONS: dict[str, Callable] = {
    "linear": lambda x: x,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "softsign": jax.nn.soft_sign,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "softplus": jax.nn.softplus,
    "swish": jax.nn.swish,
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.2),
    # tf-keras gelu defaults to the EXACT erf form; jax.nn.gelu defaults to
    # the tanh approximation (~1e-3/layer divergence — silent parity rot)
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
}


def get_activation(name: str | None) -> Callable:
    if not name:
        return ACTIVATIONS["linear"]
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise NotImplementedError(f"activation {name!r}")
