"""Fused MLP pose-head kernel (Pallas / TPU).

Every production pose head is a chain of 1x1 convs = dense matmuls over the
channel axis (models/heads.py).  This kernel runs the WHOLE chain in one
Pallas program: a tile of feature rows is loaded into VMEM once, every layer's
matmul hits the MXU with the activations applied in-register, and only the
final 3-channel pose rows go back to HBM — one HBM round trip for the whole
head instead of one per layer.

This is the batched-eval hot path (train/eval over 10k-row feature datasets,
BASELINE.md "head-96 batched throughput"); weights stay VMEM-resident across
all grid steps.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.activations import get_activation
from ...models.heads import MLPHead

__all__ = ["mlp_head_forward"]


def _kernel(spec: MLPHead, n_layers: int, x_ref, *refs):
    # refs: w0, b0, w1, b1, ..., out_ref
    out_ref = refs[-1]
    h = x_ref[:]
    for i in range(n_layers):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h = get_activation(spec.layers[i][1])(h)
    out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("spec", "tile", "interpret"))
def mlp_head_forward(spec: MLPHead, params, x, *,
                     tile: int = 512, interpret: bool = False):
    """Fused forward of an MLPHead over (N, C) feature rows → (N, 3).

    Rows are processed in `tile`-row blocks (grid over N); all layer weights
    are pinned in VMEM for the whole sweep.
    """
    n, c = x.shape
    assert c == spec.in_features
    n_layers = len(spec.layers)
    out_dim = spec.layers[-1][0]

    n_pad = (-n) % tile
    if n_pad:
        x = jnp.pad(x, ((0, n_pad), (0, 0)))
    total = x.shape[0]

    weight_args = []
    in_specs = [pl.BlockSpec((tile, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    for p in params["layers"]:
        w = p["w"]
        b = p["b"].reshape(1, -1)
        weight_args += [w, b]
        # weights replicated to every grid step: constant index map
        in_specs += [
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]

    out = pl.pallas_call(
        functools.partial(_kernel, spec, n_layers),
        grid=(total // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total, out_dim), jnp.float32),
        interpret=interpret,
    )(x, *weight_args)
    return out[:n]
