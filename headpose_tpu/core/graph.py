"""Compile a parsed Keras-2 graph (core.h5io.ModelDef) into a pure JAX function.

This is the universal compatibility layer: every ``.h5`` artifact the reference
ships (≈690 files — pose heads, unified detector models) loads through
``load_graph_model`` and runs as a single XLA program, batched, on TPU.  The
native, hand-tuned model definitions live in ``headpose_tpu.models``; this
module guarantees no artifact is left behind and provides the golden-parity
oracle for them.

Design notes (TPU-first, not a Keras port):
  * the graph is compiled once into a closure of pure functions over a params
    pytree — inference is a single ``jax.jit`` trace, no object graph at runtime;
  * everything is batch-polymorphic even where the reference hardwired batch 1
    (its unified H5 input is fixed ``[1,128,128,3]`` and rejects batch 2 —
    verified; here any leading batch works and ``vmap``/sharding compose);
  * dropout variants are identity (inference semantics), matching how the
    reference serves its artifacts (BlazePoser/blazeFaceDetectorH5.py:271-282).

Reference parity targets (file:line in /root/reference):
  * unified model 6-output contract — JoinModels.py:152-158
  * head zoo architectures — Model-88/attention_model.py, Model-88/train_88.py,
    Model-96/train_96.py:65-110
"""
from __future__ import annotations

import functools
import operator
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .activations import get_activation as _activation
from .h5io import LayerDef, ModelDef, read_model

__all__ = ["GraphModel", "TrainableGraphHead", "load_graph_model", "compile_model"]

Params = dict[str, Any]


def _padding(cfg: dict) -> str:
    return cfg.get("padding", "valid").upper()


def _conv2d(x, kernel, bias, strides, padding, feature_group_count=1,
            dilation=(1, 1)):
    y = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=tuple(strides),
        padding=padding,
        rhs_dilation=tuple(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
    )
    if bias is not None:
        y = y + bias
    return y


def _dilation(cfg: dict) -> tuple[int, int]:
    d = cfg.get("dilation_rate", (1, 1))
    return (int(d), int(d)) if isinstance(d, int) else (int(d[0]), int(d[1]))


# ---------------------------------------------------------------------------
# per-layer apply functions: (layer, params_for_layer, inputs) -> output
# ---------------------------------------------------------------------------

def _apply_conv2d(layer: LayerDef, p, xs):
    cfg = layer.config
    y = _conv2d(xs[0], p["kernel"], p.get("bias"), cfg["strides"],
                _padding(cfg), dilation=_dilation(cfg))
    return _activation(cfg.get("activation"))(y)


def _dw_kernel(p):
    # tf-keras stores the depthwise filter as 'depthwise_kernel'; Keras 3's
    # legacy-H5 writer names it plain 'kernel'
    return p["depthwise_kernel"] if "depthwise_kernel" in p else p["kernel"]


def _apply_depthwise_conv2d(layer: LayerDef, p, xs):
    cfg = layer.config
    k = _dw_kernel(p)
    kh, kw, cin, mult = k.shape
    k = k.reshape(kh, kw, 1, cin * mult)
    y = _conv2d(xs[0], k, p.get("bias"), cfg["strides"], _padding(cfg),
                feature_group_count=cin, dilation=_dilation(cfg))
    return _activation(cfg.get("activation"))(y)


def _apply_separable_conv2d(layer: LayerDef, p, xs):
    cfg = layer.config
    dk = _dw_kernel(p)
    kh, kw, cin, mult = dk.shape
    y = _conv2d(xs[0], dk.reshape(kh, kw, 1, cin * mult), None,
                cfg["strides"], _padding(cfg), feature_group_count=cin,
                dilation=_dilation(cfg))
    y = _conv2d(y, p["pointwise_kernel"], p.get("bias"), (1, 1), "VALID")
    return _activation(cfg.get("activation"))(y)


def _apply_conv2d_transpose(layer: LayerDef, p, xs):
    cfg = layer.config
    out_pad = cfg.get("output_padding")
    if out_pad is not None and any(int(v) != 0 for v in np.atleast_1d(out_pad)):
        raise NotImplementedError(
            f"Conv2DTranspose output_padding={out_pad} is not supported")
    if any(d != 1 for d in _dilation(cfg)):
        raise NotImplementedError(
            f"Conv2DTranspose dilation_rate={cfg['dilation_rate']} "
            "is not supported")
    y = jax.lax.conv_transpose(
        xs[0], p["kernel"],
        strides=tuple(cfg["strides"]),
        padding=_padding(cfg),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    if "bias" in p:
        y = y + p["bias"]
    return _activation(cfg.get("activation"))(y)


def _apply_dense(layer: LayerDef, p, xs):
    y = xs[0] @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return _activation(layer.config.get("activation"))(y)


def _require_last_axis(cfg: dict, x, what: str) -> None:
    """This compiler normalizes/broadcasts over the LAST axis; any other
    saved axis would silently broadcast wrong (fail-loud bar, see
    _apply_tf_op)."""
    axis = cfg.get("axis", -1)
    axes = [axis] if isinstance(axis, int) else list(axis)
    if any(a not in (-1, x.ndim - 1) for a in axes):
        raise NotImplementedError(
            f"{what} with axis={axis} on rank-{x.ndim} input — only the "
            "last axis is supported")


def _apply_batchnorm(layer: LayerDef, p, xs):
    cfg = layer.config
    eps = cfg.get("epsilon", 1e-3)
    x = xs[0]
    _require_last_axis(cfg, x, "BatchNormalization")
    mean = p["moving_mean"]
    var = p["moving_variance"]
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * inv
    if cfg.get("scale", True):
        y = y * p["gamma"]
    if cfg.get("center", True):
        y = y + p["beta"]
    return y


def _apply_layernorm(layer: LayerDef, p, xs):
    cfg = layer.config
    eps = cfg.get("epsilon", 1e-3)  # Keras LayerNormalization default
    x = xs[0]
    _require_last_axis(cfg, x, "LayerNormalization")
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    if "gamma" in p:
        y = y * p["gamma"]
    if "beta" in p:
        y = y + p["beta"]
    return y


def _apply_mha(layer: LayerDef, p, xs):
    """Keras MultiHeadAttention: self (q), cross (q, v — key defaults to
    value, multi_head_attention's call contract), or full (q, v, k).  Both
    writers serialize the call refs in (query, value[, key]) order (tf-keras
    as positional q + value=/key= kwarg refs, Keras 3 as positional args),
    which is the order xs arrives in.

    Weights (per core.h5io keys): query/kernel (C,H,D), key/kernel, value/kernel,
    attention_output/kernel (H,D,C) and matching biases.
    """
    q_in = xs[0]
    v_in = xs[1] if len(xs) > 1 else xs[0]
    k_in = xs[2] if len(xs) > 2 else v_in
    q = jnp.einsum("btc,chd->bthd", q_in, p["query/kernel"]) + p["query/bias"]
    k = jnp.einsum("bsc,chd->bshd", k_in, p["key/kernel"]) + p["key/bias"]
    v = jnp.einsum("bsc,chd->bshd", v_in, p["value/kernel"]) + p["value/bias"]
    d = q.shape[-1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(jnp.asarray(d, q.dtype))
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", attn, v)
    return jnp.einsum("bthd,hdc->btc", out, p["attention_output/kernel"]) + p["attention_output/bias"]


def _apply_reshape(layer: LayerDef, p, xs):
    target = layer.config["target_shape"]
    return xs[0].reshape((xs[0].shape[0], *target))


def _apply_tf_op(layer: LayerDef, p, xs):
    """TensorFlowOpLayer: a raw TF graph node captured into the Keras graph.

    `constants` maps the op's input positions that are NOT graph tensors to
    literal values; graph-tensor inputs fill the remaining positions in
    order.  Ops beyond this table stay fail-loud — silently approximating a
    TF op would load a model that runs but computes wrong values."""
    node_op = layer.config.get("node_def", {}).get("op")
    constants = layer.config.get("constants", {})

    def operands(n):
        """The op's n inputs: graph tensors + constants at their positions."""
        out, it = [], iter(xs)
        for i in range(n):
            c = constants.get(str(i))
            out.append(jnp.asarray(c) if c is not None else next(it))
        return out

    if node_op == "Pad":
        paddings = constants["1"]
        return jnp.pad(xs[0], [(int(a), int(b)) for a, b in paddings])
    if node_op == "Reshape":
        shape = constants["1"]
        # batch-polymorphic: the saved constant hardwires batch 1
        return xs[0].reshape((xs[0].shape[0], *[int(s) for s in shape[1:]]))
    if node_op in ("AddV2", "Add"):
        a, b = operands(2)
        return a + b
    if node_op == "Sub":
        a, b = operands(2)
        return a - b
    if node_op == "Mul":
        a, b = operands(2)
        return a * b
    if node_op in ("RealDiv", "Div"):
        a, b = operands(2)
        return a / b
    if node_op == "ConcatV2":
        # total inputs = graph tensors + ALL captured constants (constant
        # concat operands count too, not just the trailing axis)
        *ts, axis = operands(len(xs) + len(constants))
        return jnp.concatenate(ts, axis=int(axis))
    if node_op == "ExpandDims":
        x, axis = operands(2)
        return jnp.expand_dims(x, int(axis))
    if node_op == "Squeeze":
        dims = layer.config["node_def"].get("attr", {}).get(
            "squeeze_dims", {}).get("list", {}).get("i")
        return jnp.squeeze(xs[0], tuple(int(d) for d in dims) if dims else None)
    if node_op == "Mean":
        x, axes = operands(2)
        keep = layer.config["node_def"].get("attr", {}).get(
            "keep_dims", {}).get("b", False)
        return jnp.mean(x, axis=tuple(np.atleast_1d(axes).tolist()),
                        keepdims=bool(keep))
    raise NotImplementedError(f"TensorFlowOpLayer op {node_op!r}")


_TF_OP_LAMBDAS: dict[str, Callable] = {
    # TFOpLambda (the TF2 successor of TensorFlowOpLayer): the wrapped
    # function name is in config['function']; non-tensor call args arrive in
    # the inbound node's kwargs, already baked into the saved graph
    "math.add": lambda xs, kw: xs[0] + (xs[1] if len(xs) > 1 else kw["y"]),
    "math.subtract": lambda xs, kw: xs[0] - (xs[1] if len(xs) > 1 else kw["y"]),
    "math.multiply": lambda xs, kw: xs[0] * (xs[1] if len(xs) > 1 else kw["y"]),
    "math.truediv": lambda xs, kw: xs[0] / (xs[1] if len(xs) > 1 else kw["y"]),
    "__operators__.add": lambda xs, kw: xs[0] + (xs[1] if len(xs) > 1 else kw["y"]),
    "concat": lambda xs, kw: jnp.concatenate(xs, axis=int(kw.get("axis", 0))),
    "expand_dims": lambda xs, kw: jnp.expand_dims(xs[0], int(kw["axis"])),
    "math.reduce_mean": lambda xs, kw: jnp.mean(
        xs[0], axis=kw.get("axis"), keepdims=bool(kw.get("keepdims", False))),
    "nn.relu": lambda xs, kw: jax.nn.relu(xs[0]),
    "math.tanh": lambda xs, kw: jnp.tanh(xs[0]),
    "math.sigmoid": lambda xs, kw: jax.nn.sigmoid(xs[0]),
}


def _apply_tf_op_lambda(layer: LayerDef, p, xs, node_kwargs=None):
    fn_name = layer.config.get("function")
    fn = _TF_OP_LAMBDAS.get(fn_name)
    if fn is None:
        raise NotImplementedError(f"TFOpLambda function {fn_name!r}")
    return fn(xs, node_kwargs or {})


def _apply_lambda(layer: LayerDef, p, xs):
    """The only Lambdas in the reference artifact zoo are the spatial
    flatten/unflatten pair of the SE-Transformer head
    (Model-88/attention_model.py:42-49, 66-74), distinguishable by arity."""
    if len(xs) == 1:  # reshape_flat: (B,H,W,C) → (B,H·W,C)
        x = xs[0]
        return x.reshape(x.shape[0], x.shape[1] * x.shape[2], x.shape[3])
    t, orig = xs  # reshape_back: tokens + original spatial tensor
    return t.reshape(orig.shape[0], orig.shape[1], orig.shape[2], t.shape[2])


_LAYER_FNS: dict[str, Callable] = {
    "Conv2D": _apply_conv2d,
    "DepthwiseConv2D": _apply_depthwise_conv2d,
    "SeparableConv2D": _apply_separable_conv2d,
    "Conv2DTranspose": _apply_conv2d_transpose,
    "Dense": _apply_dense,
    "BatchNormalization": _apply_batchnorm,
    "LayerNormalization": _apply_layernorm,
    "MultiHeadAttention": _apply_mha,
    "Reshape": _apply_reshape,
    "TensorFlowOpLayer": _apply_tf_op,
    "Lambda": _apply_lambda,
    "Add": lambda l, p, xs: sum(xs[1:], xs[0]),
    "Multiply": lambda l, p, xs: functools.reduce(operator.mul, xs),
    "Average": lambda l, p, xs: sum(xs[1:], xs[0]) / len(xs),
    "Concatenate": lambda l, p, xs: jnp.concatenate(
        xs, axis=int(l.config.get("axis", -1))),
    "ReLU": lambda l, p, xs: jax.nn.relu(xs[0]),
    "Activation": lambda l, p, xs: _activation(l.config.get("activation"))(xs[0]),
    "Flatten": lambda l, p, xs: xs[0].reshape(xs[0].shape[0], -1),
    "GlobalAveragePooling2D": lambda l, p, xs: jnp.mean(
        xs[0], axis=(1, 2), keepdims=bool(l.config.get("keepdims", False))),
    "MaxPooling2D": lambda l, p, xs: jax.lax.reduce_window(
        xs[0], -jnp.inf, jax.lax.max,
        (1, *l.config["pool_size"], 1), (1, *l.config["strides"], 1),
        _padding(l.config)),
    "SpatialDropout2D": lambda l, p, xs: xs[0],  # inference semantics
    "Dropout": lambda l, p, xs: xs[0],
    "InputLayer": None,  # handled specially
}


def _extract_params(model: ModelDef) -> Params:
    params: Params = {}
    for name, layer in model.layers.items():
        if layer.submodel is not None:
            sub = _extract_params(layer.submodel)
            if sub:
                params[name] = sub
        elif layer.weights:
            params[name] = {k: jnp.asarray(v) for k, v in layer.weights.items()}
    return params


def _compile(model: ModelDef) -> Callable:
    """Build fn(params, inputs: list) -> list of outputs for one graph.

    Executes at CALL-NODE granularity: a layer invoked at several graph
    positions (weight sharing) runs once per call node, each keyed by its
    Keras node index.  Nested Functional submodels are numbered per dialect:
    tf-keras counts the inner graph's construction as node 0, so the first
    OUTER call is node 1; Keras 3 numbers outer calls from 0
    (ModelDef.keras3 records which writer produced the graph).
    """
    sub_fns = {
        name: _compile(layer.submodel)
        for name, layer in model.layers.items()
        if layer.submodel is not None
    }

    input_names = [ref[0] for ref in model.inputs]

    # node-level topological schedule: (layer_name, call_index) in dependency
    # order, computed once at compile time (sweep until no progress)
    pending = [(name, j) for name in model.order
               for j in range(len(model.layers[name].inbound))
               if model.layers[name].class_name != "InputLayer"]
    done: set[tuple[str, int]] = {(n, 0) for n in input_names}

    def node_key(name: str, j: int) -> tuple[str, int]:
        base = (1 if model.layers[name].submodel is not None
                and not model.keras3 else 0)
        return (name, j + base)

    def resolve_key(ref) -> tuple[str, int]:
        name, idx, _ = ref
        producer = model.layers.get(name)
        if producer is not None and producer.class_name == "InputLayer":
            return (name, 0)
        return (name, idx)

    schedule: list[tuple[str, int]] = []
    done_keys = set(done)
    while pending:
        progressed = False
        still = []
        for name, j in pending:
            refs = model.layers[name].inbound[j]
            if all(resolve_key(r) in done_keys for r in refs):
                schedule.append((name, j))
                done_keys.add(node_key(name, j))
                progressed = True
            else:
                still.append((name, j))
        if not progressed:
            raise ValueError(
                f"graph {model.name!r}: unresolvable node dependencies "
                f"{[n for n, _ in still]}")
        pending = still

    def apply_fn(params: Params, inputs: list) -> list:
        values: dict[tuple[str, int], Any] = {}
        for name, x in zip(input_names, inputs):
            values[(name, 0)] = x

        def lookup(ref):
            v = values[resolve_key(ref)]
            # multi-output producers (nested submodels) store a list; honor
            # the ref's tensor_index instead of passing the list
            return v[ref[2]] if isinstance(v, (list, tuple)) else v

        for name, j in schedule:
            layer = model.layers[name]
            xs = [lookup(r) for r in layer.inbound[j]]
            if layer.submodel is not None:
                outs = sub_fns[name](params.get(name, {}), xs)
                out = outs[0] if len(outs) == 1 else outs
            elif layer.class_name == "TFOpLambda":
                kw = (layer.call_kwargs[j]
                      if j < len(layer.call_kwargs) else {})
                out = _apply_tf_op_lambda(layer, params.get(name, {}), xs, kw)
            else:
                fn = _LAYER_FNS.get(layer.class_name)
                if fn is None:
                    raise NotImplementedError(f"layer {layer.class_name}")
                out = fn(layer, params.get(name, {}), xs)
            values[node_key(name, j)] = out

        outs = []
        for ref in model.outputs:
            outs.append(lookup(ref))
        return outs

    return apply_fn


class GraphModel:
    """A Keras-2 H5 artifact compiled to a pure JAX function.

    ``apply(params, *inputs)`` is jit-compatible; ``__call__`` uses the stored
    params and jits on first use.

    ``matmul_precision`` controls the MXU multiply precision: 'highest' (three
    bf16 passes — exact f32 parity with the reference, the default), 'high',
    or 'default' (single bf16 pass — fastest; the pose-MAE budget of 0.1°
    comfortably absorbs it, see BASELINE.md).
    """

    def __init__(self, model_def: ModelDef, matmul_precision: str = "highest"):
        self.definition = model_def
        self.params = _extract_params(model_def)
        self.matmul_precision = matmul_precision
        self._apply = _compile(model_def)
        self._jitted = None

    def apply(self, params: Params, *inputs):
        with jax.default_matmul_precision(self.matmul_precision):
            outs = self._apply(params, list(inputs))
        return outs[0] if len(outs) == 1 else tuple(outs)

    def __call__(self, *inputs):
        if self._jitted is None:
            self._jitted = jax.jit(self.apply)
        return self._jitted(self.params, *inputs)

    @property
    def param_count(self) -> int:
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(self.params))


class TrainableGraphHead:
    """Adapts a compiled graph HEAD to the training-loop spec contract
    (apply(params, x, train=..., rng=...) + l2_penalty), so ANY reference H5
    pose head — including architectures with no native equivalent — can be
    fine-tuned directly with headpose_tpu.train.fit:

        gm = load_graph_model("some_head.h5")
        spec = TrainableGraphHead(gm, in_features=96)
        result = fit(cfg, dataset, spec=spec, params=gm.params)

    Inference semantics (dropout = identity) are used for both train and eval
    passes; L2 regularization applies to every 'kernel' leaf.
    """

    def __init__(self, graph_model: GraphModel, in_features: int):
        self._gm = graph_model
        self.in_features = in_features

    def apply(self, params, x, *, train: bool = False, rng=None):
        del train, rng
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, None, :]
        y = self._gm.apply(params, x)
        if isinstance(y, tuple):
            raise ValueError("head graphs must have a single output")
        return y.reshape(y.shape[0], -1) if squeeze else y

    def l2_penalty(self, params, rate: float):
        if rate == 0.0:
            return 0.0
        total = 0.0
        # walk the full pytree (nested submodels included) by key path
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            if any("kernel" in getattr(k, "key", "") for k in path):
                total = total + jnp.sum(jnp.square(leaf))
        return rate * total


def compile_model(model_def: ModelDef, **kwargs) -> GraphModel:
    return GraphModel(model_def, **kwargs)


def load_graph_model(path: str, **kwargs) -> GraphModel:
    """Load any reference-format Keras-2 H5 into a jit-compiled GraphModel."""
    return GraphModel(read_model(path), **kwargs)
