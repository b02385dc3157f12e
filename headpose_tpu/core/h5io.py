"""Keras-2 H5 reader built directly on h5py.

The reference ships ~690 Keras-2 ``.h5`` artifacts (heads, detectors, unified
models).  Stock Keras 3 cannot deserialize them, and depending on TensorFlow
for weight loading would drag a second framework into the TPU stack — so this
module parses the H5 format directly: the ``model_config`` JSON attribute
describes the layer graph, and the ``model_weights`` group holds the arrays.

Reference behaviours this mirrors (for parity checking, not code):
  * model topology as saved by JoinModels.py:75-87
  * weight layout consumed by tf.keras.models.load_model
    (BlazePoser/blazeFaceDetectorH5.py:96-102)
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any

import h5py
import numpy as np

__all__ = ["LayerDef", "ModelDef", "read_model"]


@dataclasses.dataclass
class LayerDef:
    """One node of a Keras functional graph."""

    name: str
    class_name: str
    config: dict[str, Any]
    # Per call-node list of (layer_name, node_index, tensor_index) inputs.
    inbound: list[list[tuple[str, int, int]]]
    weights: dict[str, np.ndarray] = dataclasses.field(default_factory=dict)
    # Present when class_name is Functional/Model: the nested sub-model.
    submodel: "ModelDef | None" = None
    # Per call-node non-tensor kwargs (TFOpLambda scalars like y=2.0).
    call_kwargs: list[dict[str, Any]] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class ModelDef:
    """A parsed functional model: layers plus input/output tensor refs."""

    name: str
    layers: dict[str, LayerDef]
    order: list[str]  # topological order as saved
    inputs: list[tuple[str, int, int]]
    outputs: list[tuple[str, int, int]]
    # True when the graph was written by Keras 3 (kwargs-style dict inbound
    # nodes).  The dialects number nested-submodel call nodes differently —
    # tf-keras counts the inner graph's construction as node 0 so the first
    # OUTER call is node 1, Keras 3 numbers outer calls from 0 — and the
    # compiler must key produced values accordingly.
    keras3: bool = False

    def param_count(self) -> int:
        n = 0
        for layer in self.layers.values():
            n += sum(int(np.prod(w.shape)) for w in layer.weights.values())
            if layer.submodel is not None:
                n += layer.submodel.param_count()
        return n


def _parse_inbound(raw) -> tuple[list[list[tuple[str, int, int]]],
                                 list[dict]]:
    """Normalize Keras inbound_nodes into per-call ref lists + kwargs.

    Three on-disk shapes exist: classic nested `[[["prev", 0, 0, {}], ...]]`,
    TFOpLambda's FLAT call `[["prev", 0, 0, {"y": 2.0}]]` (the whole call is
    one ref whose 4th element carries non-tensor kwargs), and the newer
    kwargs-style dict nodes."""
    def arg_refs(a, refs):
        """Extract keras-tensor refs from one saved positional arg (a
        Keras-tensor dict, or a LIST of them — e.g. tf.concat's tensor
        list)."""
        if isinstance(a, dict) and "config" in a:
            kh = a["config"].get("keras_history")
            if kh:
                refs.append((kh[0], int(kh[1]), int(kh[2])))
        elif isinstance(a, list):
            for e in a:
                arg_refs(e, refs)

    def consume_kwargs(d: dict, kwarg_refs, kw, seen):
        """Fold one saved call-kwargs dict into (kwarg_refs, kw).

        Non-tensor call kwargs (axis=..., keepdims=...) must survive:
        dropping them silently changes op semantics (e.g. tf.concat's axis
        falls back to 0).  Tensor-valued kwargs (e.g. tf.math.add's y=)
        arrive either as a nested Keras-tensor dict (keras_history inside
        "config") or, in the flat/classic formats, as a bare history triple
        [layer, node, idx] — both become inbound refs.  `seen` dedups keys:
        the classic nested format replicates the same kwargs dict on every
        positional item of the call.  kwarg_refs is kept separate so tensor
        kwargs always land AFTER every positional ref regardless of which
        item carried the dict.  Tensor kwargs are collected as (name, ref)
        so the caller can canonicalize order-sensitive pairs (a user calling
        mha(q, key=k, value=v) makes the writer serialize key before value;
        flattening in file order would swap the operands)."""
        for k, v in d.items():
            if k == "name" or v is None or k in seen:
                continue
            seen.add(k)
            if isinstance(v, dict) and "config" in v:
                kh = v["config"].get("keras_history")
                if kh:
                    kwarg_refs.append((k, (kh[0], int(kh[1]), int(kh[2]))))
                    continue
            if (isinstance(v, list) and len(v) == 3 and isinstance(v[0], str)
                    and not isinstance(v[1], (list, dict, str))):
                kwarg_refs.append((k, (v[0], int(v[1]), int(v[2]))))
                continue
            kw[k] = v

    nodes, kwargs = [], []
    for call in raw or []:
        refs, kwarg_refs, kw, seen = [], [], {}, set()
        if (isinstance(call, list) and call and isinstance(call[0], str)):
            # flat TFOpLambda-style call: one ref + kwargs
            refs.append((call[0], int(call[1]), int(call[2])))
            if len(call) > 3 and isinstance(call[3], dict):
                consume_kwargs(call[3], kwarg_refs, kw, seen)
        else:
            # a call node is a list of items (tf-keras) or, in Keras 3's
            # writer, one bare kwargs-style dict
            for item in ([call] if isinstance(call, dict) else call):
                if isinstance(item, list):
                    refs.append((item[0], int(item[1]), int(item[2])))
                    if len(item) > 3 and isinstance(item[3], dict):
                        consume_kwargs(item[3], kwarg_refs, kw, seen)
                elif isinstance(item, dict):  # newer keras kwargs-style node
                    for a in item.get("args", []):
                        arg_refs(a, refs)
                    consume_kwargs(item.get("kwargs") or {}, kwarg_refs, kw,
                                   seen)
        # Canonical call-signature order for the one order-sensitive pair:
        # MultiHeadAttention's call(query, value, key) — 'value' must precede
        # 'key' regardless of which order the user passed them.  Stable sort:
        # every other kwarg keeps its insertion position.
        kwarg_refs.sort(key=lambda kv: 1 if kv[0] == "key" else 0)
        nodes.append(refs + [ref for _, ref in kwarg_refs])
        kwargs.append(kw)
    return nodes, kwargs


def _parse_ref_list(raw) -> list[tuple[str, int, int]]:
    if (isinstance(raw, list) and len(raw) == 3 and isinstance(raw[0], str)
            and not isinstance(raw[1], (list, str))):
        # Keras 3's legacy-H5 writer flattens a single-entry ref list to one
        # bare [name, node, idx] triple
        raw = [raw]
    return [(r[0], int(r[1]), int(r[2])) for r in raw]


def _is_keras3_nodes(raw) -> bool:
    """True when a raw inbound_nodes value uses Keras 3's kwargs-style dict
    call format (tf-keras / Keras 2 always write list nodes)."""
    for call in raw or []:
        if isinstance(call, dict):
            return True
        if isinstance(call, list) and any(
                isinstance(item, dict) and ("args" in item or "kwargs" in item)
                for item in call):
            return True
    return False


def _parse_graph(name: str, cfg: dict) -> ModelDef:
    layers: dict[str, LayerDef] = {}
    order: list[str] = []
    keras3 = False
    for lraw in cfg["layers"]:
        lname = lraw["name"]
        cls = lraw["class_name"]
        lconf = lraw.get("config", {})
        sub = None
        if cls in ("Functional", "Model"):
            sub = _parse_graph(lname, lconf if "layers" in lconf else lconf["config"])
        keras3 = keras3 or _is_keras3_nodes(lraw.get("inbound_nodes"))
        inbound, call_kwargs = _parse_inbound(lraw.get("inbound_nodes"))
        layers[lname] = LayerDef(
            name=lname,
            class_name=cls,
            config=lconf,
            inbound=inbound,
            submodel=sub,
            call_kwargs=call_kwargs,
        )
        order.append(lname)
    return ModelDef(
        name=name,
        layers=layers,
        order=order,
        inputs=_parse_ref_list(cfg["input_layers"]),
        outputs=_parse_ref_list(cfg["output_layers"]),
        keras3=keras3,
    )


def _weight_key(path_parts: list[str]) -> str:
    """Short weight key from an H5 weight path.

    'conv2d/kernel:0' → 'kernel'; MultiHeadAttention paths keep one level of
    qualification: '.../query/kernel:0' → 'query/kernel'.
    """
    short = path_parts[-1]
    short = short[:-2] if short.endswith(":0") else short
    if len(path_parts) >= 3:
        short = path_parts[-2] + "/" + short
    return short


def _route_weight(model: ModelDef, parts: list[str], arr: np.ndarray) -> None:
    """Attach one weight array, descending through nested submodels by path.
    Unroutable weights raise — silently dropping one (e.g. a bias) would load
    a model that runs but computes wrong values."""
    lname = parts[0]
    layer = model.layers.get(lname)
    if layer is None:
        raise ValueError(
            f"weight path {'/'.join(parts)!r} does not match any layer of "
            f"model {model.name!r}")
    if layer.submodel is not None and len(parts) > 2:
        _route_weight(layer.submodel, parts[1:], arr)
    else:
        layer.weights[_weight_key(parts)] = arr


def _attach_weights(model: ModelDef, group: h5py.Group) -> None:
    """Walk the model_weights group and attach arrays to their layers.

    Layout: model_weights/<layer>/ holds an attr ``weight_names`` listing
    path-style names ('conv2d/kernel:0', 'mha/query/kernel:0', …) with the
    arrays stored at those paths inside the group.  Nested functional
    submodels reuse the same convention one level down.
    """
    for lname, layer in model.layers.items():
        if lname not in group:
            continue
        lgroup = group[lname]
        names = lgroup.attrs.get("weight_names")
        if names is None:
            continue
        for wname in names:
            wname = wname.decode() if isinstance(wname, bytes) else wname
            arr = np.asarray(lgroup[wname])
            parts = wname.split("/")
            if layer.submodel is not None:
                _route_weight(layer.submodel, parts, arr)
            else:
                layer.weights[_weight_key(parts)] = arr


def _keras3_var_names(layer: LayerDef) -> list[str]:
    """Positional variable names for one layer class in Keras 3's native
    ``.keras`` weight store (``layers/<name>/vars/0..N`` — order is the
    order build() creates them).  Flag-dependent variables (bias, gamma,
    beta) are included only when the saved config enables them, so the
    positional mapping stays exact."""
    cls, cfg = layer.class_name, layer.config
    bias = ["bias"] if cfg.get("use_bias", True) else []
    if cls in ("Conv2D", "Conv2DTranspose", "Dense", "DepthwiseConv2D"):
        return ["kernel"] + bias
    if cls == "SeparableConv2D":
        return ["depthwise_kernel", "pointwise_kernel"] + bias
    if cls in ("BatchNormalization", "LayerNormalization"):
        names = []
        if cfg.get("scale", True):
            names.append("gamma")
        if cfg.get("center", True):
            names.append("beta")
        if cls == "BatchNormalization":
            names += ["moving_mean", "moving_variance"]
        return names
    if cls == "Embedding":
        return ["embeddings"]
    raise NotImplementedError(
        f"no Keras-3 variable-name mapping for layer class {cls!r} "
        f"({layer.name!r}) — cannot attach its saved weights")


def _snake_case(name: str) -> str:
    import re

    name = re.sub(r"\W+", "", name)
    name = re.sub(r"(.)([A-Z][a-z]+)", r"\1_\2", name)
    return re.sub(r"([a-z])([A-Z])", r"\1_\2", name).lower()


def _attach_keras3_weights(model: ModelDef, layers_group: h5py.Group) -> None:
    """Attach arrays from a ``.keras`` archive's positional weight store.

    The store does NOT key groups by layer.name (Keras considers
    autogenerated names non-reproducible): each group is named
    snake_case(class name) with a per-container counter, in model.layers
    order.  We regenerate the same sequence from the parsed graph order."""
    used: dict[str, int] = {}
    for lname in model.order:
        layer = model.layers[lname]
        base = _snake_case(layer.class_name)
        if base in used:
            used[base] += 1
            store = f"{base}_{used[base]}"
        else:
            used[base] = 0
            store = base
        if store not in layers_group:
            continue
        lgroup = layers_group[store]
        if layer.submodel is not None and "layers" in lgroup:
            _attach_keras3_weights(layer.submodel, lgroup["layers"])
            continue
        vgroup = lgroup["vars"] if "vars" in lgroup else None
        n = len(vgroup) if vgroup is not None else 0
        if n == 0:
            # Weightless layers legitimately store nothing — but a layer
            # whose variables live in SUBLAYER groups (Keras 3 saves each
            # child layer's vars under its own group) must not be skipped
            # silently: that would load a model with empty weights that
            # fails far from the cause.  Handle the known layouts, refuse
            # the rest.
            sub = {k: v for k, v in lgroup.items()
                   if isinstance(v, h5py.Group) and len(v.get("vars", ()))}
            if not sub:
                continue
            if layer.class_name == "MultiHeadAttention":
                # child denses → this module's path-style keys (the ones
                # _apply_mha consumes): query/key/value/attention_output
                for store_name, key in (("query_dense", "query"),
                                        ("key_dense", "key"),
                                        ("value_dense", "value"),
                                        ("output_dense", "attention_output")):
                    sv = lgroup[store_name]["vars"]
                    layer.weights[f"{key}/kernel"] = np.asarray(sv["0"])
                    if "1" in sv:  # absent when use_bias=False
                        layer.weights[f"{key}/bias"] = np.asarray(sv["1"])
                continue
            raise NotImplementedError(
                f"layer {lname!r} ({layer.class_name}) stores its variables "
                f"in sublayer groups {sorted(sub)} — no mapping to this "
                "module's weight keys; refusing to load it empty")
        names = _keras3_var_names(layer)
        if n != len(names):
            raise ValueError(
                f"layer {lname!r} ({layer.class_name}) stores {n} variables "
                f"but the config implies {len(names)} ({names}) — refusing "
                "to guess the positional mapping")
        for i, wname in enumerate(names):
            layer.weights[wname] = np.asarray(vgroup[str(i)])


def _read_keras3_archive(path: str) -> ModelDef:
    """Parse a Keras 3 native ``.keras`` zip (config.json +
    model.weights.h5).  The graph dict inside config.json is the same
    dialect as Keras 3's legacy-H5 ``model_config``, so graph parsing is
    shared; only the weight store differs (positional ``vars``)."""
    import io
    import zipfile

    with zipfile.ZipFile(path) as z:
        cfg = json.loads(z.read("config.json"))
        model = _parse_graph(cfg["config"].get("name", "model"), cfg["config"])
        with h5py.File(io.BytesIO(z.read("model.weights.h5")), "r") as f:
            root = f["layers"] if "layers" in f else f["_layer_checkpoint_dependencies"]
            _attach_keras3_weights(model, root)
    return model


def read_model(path: str) -> ModelDef:
    """Parse a Keras H5 file (or a Keras 3 ``.keras`` archive) into a
    ModelDef without any Keras dependency."""
    import zipfile

    if zipfile.is_zipfile(path):
        return _read_keras3_archive(path)
    with h5py.File(path, "r") as f:
        cfg = json.loads(f.attrs["model_config"])
        model = _parse_graph(cfg["config"].get("name", "model"), cfg["config"])
        _attach_weights(model, f["model_weights"])
    return model
