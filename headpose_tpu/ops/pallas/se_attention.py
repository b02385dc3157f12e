"""Fused SE + Transformer pose-head kernel (Pallas / TPU).

The SE-Transformer head (models.heads.SETransformerHead, mirroring
Model-88/attention_model.py:16-80) is the BASELINE.json north-star op:
"attention regression heads rewritten as fused Pallas matmul+attention
kernels".  At 16x16 = 256 spatial tokens of 88 channels the ENTIRE head fits
in VMEM, so one kernel per image computes:

    SE gate (token-mean → 2 tiny matmuls → sigmoid scale)
    → QKV projections → 256x256 attention → output projection
    → residual + LayerNorm → FFN → residual + LayerNorm
    → hidden conv (relu) → 3-channel pose conv

with zero HBM round trips between stages.  Grid = batch; weights are
VMEM-resident across all images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.heads import SETransformerHead

__all__ = ["se_transformer_forward"]

_EPS = 1e-3  # Keras LayerNormalization default


def _layernorm(x, g, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + _EPS) * g + b


def _kernel(spec: SETransformerHead,
            x_ref, se1w_ref, se1b_ref, se2w_ref, se2b_ref,
            qw_ref, qb_ref, kw_ref, kb_ref, vw_ref, vb_ref,
            ow_ref, ob_ref, ln1g_ref, ln1b_ref,
            f1w_ref, f1b_ref, f2w_ref, f2b_ref, ln2g_ref, ln2b_ref,
            fcw_ref, fcb_ref, outw_ref, outb_ref, out_ref):
    C, H, D = spec.in_features, spec.num_heads, spec.key_dim
    x = x_ref[0]  # (T, C) tokens of this image

    # --- squeeze-and-excitation channel gate
    pooled = jnp.mean(x, axis=0, keepdims=True)                     # (1, C)
    s = jax.nn.relu(jnp.dot(pooled, se1w_ref[:],
                            preferred_element_type=jnp.float32) + se1b_ref[:])
    s = jax.nn.sigmoid(jnp.dot(s, se2w_ref[:],
                               preferred_element_type=jnp.float32) + se2b_ref[:])
    t = x * s                                                       # (T, C)

    # --- multi-head self-attention (flattened head layout: C → H*D).
    # Heads are statically unrolled into 2D MXU matmuls — Mosaic has no
    # batched-3D matmul, and at H=4 tiny heads unrolling is free.
    q = jnp.dot(t, qw_ref[:], preferred_element_type=jnp.float32) + qb_ref[:]
    k = jnp.dot(t, kw_ref[:], preferred_element_type=jnp.float32) + kb_ref[:]
    v = jnp.dot(t, vw_ref[:], preferred_element_type=jnp.float32) + vb_ref[:]
    inv_scale = 1.0 / jnp.sqrt(jnp.asarray(D, jnp.float32))
    head_outs = []
    for h in range(H):
        sl = slice(h * D, (h + 1) * D)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * inv_scale      # (T, T)
        attn = jax.nn.softmax(scores, axis=-1)
        head_outs.append(jnp.dot(attn, v[:, sl],
                                 preferred_element_type=jnp.float32))
    o = jnp.concatenate(head_outs, axis=1)                        # (T, H*D)
    o = jnp.dot(o, ow_ref[:], preferred_element_type=jnp.float32) + ob_ref[:]

    # --- transformer block tail
    t1 = _layernorm(t + o, ln1g_ref[:], ln1b_ref[:])
    f = jax.nn.relu(jnp.dot(t1, f1w_ref[:],
                            preferred_element_type=jnp.float32) + f1b_ref[:])
    f = jnp.dot(f, f2w_ref[:], preferred_element_type=jnp.float32) + f2b_ref[:]
    t2 = _layernorm(t1 + f, ln2g_ref[:], ln2b_ref[:])

    # --- regression convs (1x1 = dense over channels)
    h = jax.nn.relu(jnp.dot(t2, fcw_ref[:],
                            preferred_element_type=jnp.float32) + fcb_ref[:])
    out_ref[0] = jnp.dot(h, outw_ref[:],
                         preferred_element_type=jnp.float32) + outb_ref[:]


@functools.partial(jax.jit, static_argnames=("spec", "interpret"))
def se_transformer_forward(spec: SETransformerHead, params, x, *,
                           interpret: bool = False):
    """Fused forward: x (B, H, W, C) → (B, H, W, 3) pose maps.

    Numerically equivalent to SETransformerHead.apply (tested to 1e-5); the
    difference is execution shape: one fused VMEM-resident program per image.
    """
    B, Hs, Ws, C = x.shape
    T = Hs * Ws
    Hn, D = spec.num_heads, spec.key_dim
    tokens = x.reshape(B, T, C)

    def flat_qkv(p):  # (C, H, D) → (C, H*D)
        return p["w"].reshape(C, Hn * D), p["b"].reshape(1, Hn * D)

    qw, qb = flat_qkv(params["query"])
    kw, kb = flat_qkv(params["key"])
    vw, vb = flat_qkv(params["value"])
    ow = params["attn_out"]["w"].reshape(Hn * D, C)
    ob = params["attn_out"]["b"].reshape(1, C)

    args = [
        params["se"]["fc1"]["w"], params["se"]["fc1"]["b"].reshape(1, -1),
        params["se"]["fc2"]["w"], params["se"]["fc2"]["b"].reshape(1, -1),
        qw, qb, kw, kb, vw, vb, ow, ob,
        params["ln1"]["g"].reshape(1, C), params["ln1"]["b"].reshape(1, C),
        params["ff1"]["w"], params["ff1"]["b"].reshape(1, -1),
        params["ff2"]["w"], params["ff2"]["b"].reshape(1, -1),
        params["ln2"]["g"].reshape(1, C), params["ln2"]["b"].reshape(1, C),
        params["fc"]["w"], params["fc"]["b"].reshape(1, -1),
        params["out"]["w"], params["out"]["b"].reshape(1, -1),
    ]

    in_specs = [pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]
    # nd=a.ndim binds at definition time — a bare `a.ndim` in the lambda
    # would late-bind to the LAST arg's rank for every spec
    in_specs += [pl.BlockSpec(a.shape, lambda b, nd=a.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for a in args]

    out = pl.pallas_call(
        functools.partial(_kernel, spec),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, spec.out_features), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, spec.out_features), jnp.float32),
        interpret=interpret,
    )(tokens, *args)
    return out.reshape(B, Hs, Ws, spec.out_features)
