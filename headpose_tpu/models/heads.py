"""Native pose-regression head zoo (TPU-first).

The reference defines all of its heads as stacks of 1x1 convolutions over
(B, H, W, C) feature maps (Model-88/attention_model.py, Model-88/train_88.py:66-253,
Model-96/train_96.py:65-110).  A 1x1 conv over an HxW map *is* a matmul over
H·W·B rows — so the native implementation collapses every head to dense
matmul chains on (..., C) arrays, which map straight onto the MXU, batched
and fusion-friendly.  The same parameters therefore serve
  * per-face feature vectors (N, C)         — training/eval datasets
  * full feature maps (B, H, W, C)          — pose-map outputs of the
    unified detector (JoinModels.py:65-66)
with no input-shape surgery: the reference's InputShapeConvertor exists only
because Keras bakes input shapes into its graphs; functional JAX heads are
shape-polymorphic by construction.

Head families (reference architecture → here):
  * mlp          — any 1x1-conv chain: train_96 create_model (96→F tanh→3),
                   train_88 create_model / bestmodelV1 (88→F softsign→3),
                   the trivial 88→3 head, stoqa9pt, hrchr82r, …
  * residual_mlp — create_model_complex: projection + N residual blocks
                   (softsign) + bottleneck + linear out (train_88 default)
  * skip_mlp     — create_model_skip_fc: encoder/decoder with one skip add
  * se_mlp       — create_modelC: SE channel gating + 1x1 conv head
  * se_transformer — se_transformer_regr_head: SE gating + spatial-token MHA
                   block + FFN + conv head (attention_model.py:16-80)

All initializers are Glorot-uniform to match the reference's training setup.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "MLPHead", "ResidualMLPHead", "SkipMLPHead", "SEMLPHead",
    "SETransformerHead", "EnsembleHead",
    "head_from_h5", "head_from_keras_json", "se_transformer_from_h5",
    "mlp_head_from_modeldef", "HEAD_REGISTRY",
]

Params = dict[str, Any]

from ..core.activations import get_activation as _get_act


def _glorot(key, cin: int, cout: int, dtype=jnp.float32):
    limit = math.sqrt(6.0 / (cin + cout))
    return jax.random.uniform(key, (cin, cout), dtype, -limit, limit)


def _dense_init(key, cin: int, cout: int) -> Params:
    return {"w": _glorot(key, cin, cout), "b": jnp.zeros((cout,), jnp.float32)}


def _dense(p: Params, x, act: str):
    return _get_act(act)(x @ p["w"] + p["b"])


def _spatial_dropout(key, x, rate: float):
    """SpatialDropout2D semantics: drop whole channels.  Works on (..., C)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (x.shape[-1],)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


# ---------------------------------------------------------------------------
# MLP head — the workhorse family (every shipped production head is one)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLPHead:
    """A chain of (features, activation) dense layers over the channel axis.

    E.g. the production reg2 head hrchr82r is
    ``MLPHead(96, ((32, 'tanh'), (16, 'tanh'), (3, 'linear')))`` and reg1
    stoqa9pt is ``MLPHead(88, ((64, 'softsign'), (3, 'linear')))``.
    """

    in_features: int
    layers: tuple[tuple[int, str], ...]
    dropout_rate: float = 0.0  # applied after every layer, train mode only

    # a pure per-cell function: applying it to a feature MAP equals applying
    # it to each cell's vector (the training/dataset semantics) — see
    # runtime.detector head_eval
    spatial_context = False

    def init(self, key) -> Params:
        params = []
        cin = self.in_features
        for i, (cout, _) in enumerate(self.layers):
            params.append(_dense_init(jax.random.fold_in(key, i), cin, cout))
            cin = cout
        return {"layers": params}

    def apply(self, params: Params, x, *, train: bool = False, rng=None):
        for i, (p, (_, act)) in enumerate(zip(params["layers"], self.layers)):
            x = _dense(p, x, act)
            if train and self.dropout_rate > 0.0:
                x = _spatial_dropout(jax.random.fold_in(rng, i), x, self.dropout_rate)
        return x

    def l2_penalty(self, params: Params, rate: float):
        """Keras-style l2 kernel+bias regularization (loss-added, not decoupled)."""
        if rate == 0.0:
            return 0.0
        return rate * sum(jnp.sum(jnp.square(p["w"])) + jnp.sum(jnp.square(p["b"]))
                          for p in params["layers"])


# ---------------------------------------------------------------------------
# Residual softsign head — train_88's production family (create_model_complex)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResidualMLPHead:
    """Projection → N residual (2-layer softsign) blocks with relu after the
    add → bottleneck → linear output.  Mirrors Model-88/attention_model.py:97-169."""

    in_features: int = 88
    width: int = 16
    num_blocks: int = 3
    bottleneck: int = 8
    out_features: int = 3
    activation: str = "softsign"
    dropout_rate: float = 0.0

    spatial_context = False  # 1x1-conv chain: per-cell

    def init(self, key) -> Params:
        ks = jax.random.split(key, 2 + 2 * self.num_blocks + 1)
        params: Params = {"proj": _dense_init(ks[0], self.in_features, self.width)}
        blocks = []
        for b in range(self.num_blocks):
            blocks.append({
                "fc1": _dense_init(ks[1 + 2 * b], self.width, self.width),
                "fc2": _dense_init(ks[2 + 2 * b], self.width, self.width),
            })
        params["blocks"] = blocks
        params["bottleneck"] = _dense_init(ks[-2], self.width, self.bottleneck)
        params["out"] = _dense_init(ks[-1], self.bottleneck, self.out_features)
        return params

    def apply(self, params: Params, x, *, train: bool = False, rng=None):
        act = self.activation
        dr = self.dropout_rate if train else 0.0

        def drop(i, v):
            return _spatial_dropout(jax.random.fold_in(rng, i), v, dr) if dr else v

        x = drop(0, _dense(params["proj"], x, act))
        for b, blk in enumerate(params["blocks"]):
            y = drop(10 + 2 * b, _dense(blk["fc1"], x, act))
            y = drop(11 + 2 * b, _dense(blk["fc2"], y, act))
            x = jax.nn.relu(x + y)
        x = drop(1, _dense(params["bottleneck"], x, act))
        return _dense(params["out"], x, "linear")

    def l2_penalty(self, params: Params, rate: float):
        if rate == 0.0:
            return 0.0
        # reference regularizes kernels only here (attention_model.py:113-166)
        kernels = [params["proj"]["w"], params["bottleneck"]["w"], params["out"]["w"]]
        kernels += [blk[k]["w"] for blk in params["blocks"] for k in ("fc1", "fc2")]
        return rate * sum(jnp.sum(jnp.square(w)) for w in kernels)


# ---------------------------------------------------------------------------
# Skip head — train_88 create_model_skip_fc (163-223)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SkipMLPHead:
    in_features: int = 88
    enc1: int = 32
    enc2: int = 64
    out_features: int = 3
    activation: str = "softsign"
    dropout_rate: float = 0.0

    spatial_context = False  # 1x1-conv chain: per-cell

    def init(self, key) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "enc1": _dense_init(k1, self.in_features, self.enc1),
            "enc2": _dense_init(k2, self.enc1, self.enc2),
            "dec": _dense_init(k3, self.enc2, self.enc1),
            "out": _dense_init(k4, self.enc1, self.out_features),
        }

    def apply(self, params: Params, x, *, train: bool = False, rng=None):
        a = self.activation

        def drop(v, i):
            # reference places SpatialDropout2D after x1, x2, and the
            # skip-add (train_88.py:185, 196, 210)
            if train and self.dropout_rate > 0.0:
                return _spatial_dropout(jax.random.fold_in(rng, i), v,
                                        self.dropout_rate)
            return v

        x1 = drop(_dense(params["enc1"], x, a), 0)
        x2 = drop(_dense(params["enc2"], x1, a), 1)
        x3 = drop(_dense(params["dec"], x2, a) + x1, 2)
        return _dense(params["out"], x3, "linear")

    def l2_penalty(self, params: Params, rate: float):
        if rate == 0.0:
            return 0.0
        return rate * sum(jnp.sum(jnp.square(params[k]["w"]))
                          for k in ("enc1", "enc2", "dec", "out"))


# ---------------------------------------------------------------------------
# SE heads — channel gating (create_modelC) and the SE-Transformer head
# ---------------------------------------------------------------------------

def _se_init(key, channels: int, reduction: int) -> Params:
    k1, k2 = jax.random.split(key)
    mid = channels // reduction
    return {"fc1": _dense_init(k1, channels, mid),
            "fc2": _dense_init(k2, mid, channels)}


def _se_apply(p: Params, x):
    """Squeeze-and-excitation over the channel axis.

    x is (B, H, W, C) or (N, C); the squeeze averages all non-channel,
    non-batch axes (GlobalAveragePooling2D in the reference)."""
    axes = tuple(range(1, x.ndim - 1))
    s = jnp.mean(x, axis=axes) if axes else x
    s = _dense(p["fc1"], s, "relu")
    s = _dense(p["fc2"], s, "sigmoid")
    s = s.reshape(s.shape[:1] + (1,) * len(axes) + s.shape[-1:])
    return x * s


@dataclasses.dataclass(frozen=True)
class SEMLPHead:
    """SE gate + 1x1-conv head: Model-88/attention_model.py:82-95 (create_modelC)."""

    in_features: int = 88
    reduction: int = 8
    hidden: int = 42
    out_features: int = 3

    # the SE gate pools over ALL spatial positions when applied to a map —
    # a different function from the per-vector training semantics
    spatial_context = True

    def init(self, key) -> Params:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "se": _se_init(k1, self.in_features, self.reduction),
            "fc": _dense_init(k2, self.in_features, self.hidden),
            "out": _dense_init(k3, self.hidden, self.out_features),
        }

    def apply(self, params: Params, x, *, train: bool = False, rng=None):
        x = _se_apply(params["se"], x)
        x = _dense(params["fc"], x, "relu")
        return _dense(params["out"], x, "linear")

    def l2_penalty(self, params, rate):
        return 0.0


@dataclasses.dataclass(frozen=True)
class SETransformerHead:
    """SE gating + one Transformer encoder block over spatial tokens + conv head.

    Mirrors se_transformer_regr_head (Model-88/attention_model.py:16-80): the
    flatten/unflatten Lambda pair becomes plain reshapes, and the whole block
    runs as fused matmuls — at 16x16=256 tokens this is one MXU-sized program,
    the "fused Pallas matmul+attention kernel" target of BASELINE.json.
    """

    in_features: int = 88
    reduction: int = 16
    num_heads: int = 4
    key_dim: int = 16
    ff_dim: int = 64
    hidden: int = 128
    out_features: int = 3

    # SE gate + token attention couple ALL spatial positions on a map
    spatial_context = True

    def init(self, key) -> Params:
        ks = jax.random.split(key, 10)
        C, H, D = self.in_features, self.num_heads, self.key_dim
        lim_qkv = math.sqrt(6.0 / (C + H * D))
        lim_out = math.sqrt(6.0 / (H * D + C))

        def qkv(k):
            return {"w": jax.random.uniform(k, (C, H, D), jnp.float32, -lim_qkv, lim_qkv),
                    "b": jnp.zeros((H, D), jnp.float32)}

        return {
            "se": _se_init(ks[0], C, self.reduction),
            "query": qkv(ks[1]), "key": qkv(ks[2]), "value": qkv(ks[3]),
            "attn_out": {
                "w": jax.random.uniform(ks[4], (H, D, C), jnp.float32, -lim_out, lim_out),
                "b": jnp.zeros((C,), jnp.float32)},
            "ln1": {"g": jnp.ones((C,)), "b": jnp.zeros((C,))},
            "ff1": _dense_init(ks[5], C, self.ff_dim),
            "ff2": _dense_init(ks[6], self.ff_dim, C),
            "ln2": {"g": jnp.ones((C,)), "b": jnp.zeros((C,))},
            "fc": _dense_init(ks[7], C, self.hidden),
            "out": _dense_init(ks[8], self.hidden, self.out_features),
        }

    @staticmethod
    def _layernorm(p, x, eps=1e-3):  # Keras LayerNormalization default epsilon
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]

    def apply(self, params: Params, x, *, train: bool = False, rng=None):
        # accept (N, C) by treating each row as a 1x1 map
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, None, :]
        B, H, W, C = x.shape
        g = _se_apply(params["se"], x)
        t = g.reshape(B, H * W, C)

        q = jnp.einsum("btc,chd->bthd", t, params["query"]["w"]) + params["query"]["b"]
        k = jnp.einsum("bsc,chd->bshd", t, params["key"]["w"]) + params["key"]["b"]
        v = jnp.einsum("bsc,chd->bshd", t, params["value"]["w"]) + params["value"]["b"]
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(
            jnp.asarray(self.key_dim, t.dtype))
        attn = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bhts,bshd->bthd", attn, v)
        o = jnp.einsum("bthd,hdc->btc", o, params["attn_out"]["w"]) + params["attn_out"]["b"]

        t = self._layernorm(params["ln1"], t + o)
        f = _dense(params["ff1"], t, "relu")
        f = _dense(params["ff2"], f, "linear")
        t = self._layernorm(params["ln2"], t + f)

        y = t.reshape(B, H, W, C)
        y = _dense(params["fc"], y, "relu")
        y = _dense(params["out"], y, "linear")
        return y[:, 0, 0, :] if squeeze else y

    def l2_penalty(self, params, rate):
        return 0.0


@dataclasses.dataclass(frozen=True)
class EnsembleHead:
    """Combination of K member heads, evaluated as ONE fused program:
    a uniform average by default, or a stacked (per-member, per-angle
    affine) combination when `weights` is set.

    The reference sweeps 109 runs (Model-96/sweep.yaml) and ships only the
    single winner (blazeFaceDetectorH5.py:102) — the rest of the pool is
    discarded.  Here the pool is an asset: pose heads are a few thousand
    params each, so averaging K of them adds K tiny matmul chains to a
    program dominated by the backbone — XLA fuses them side by side and the
    marginal serving cost is negligible, while the variance reduction beats
    any single member (see scripts/ensemble88.py and docs/TRAINING.md).

    `weights` (shape K×3, one weight per member per yaw/pitch/roll output)
    and `bias` (shape 3) turn the average into a stacked generalization:
    ``y = sum_k weights[k] * member_k(x) + bias``.  The weights are STATIC
    spec fields (they bake into the compiled program, serialize in
    spec.json, and need no TP sharding rule), fit by ridge regression on
    held-out labeled data — see scripts/stack_ensemble.py and
    docs/TRAINING.md for the calibration protocol and its honest labeling.

    Members may mix families (MLP/residual/skip/SE/SE-Transformer) as long
    as they agree on `in_features`.  The dataclass is a valid head itself:
    `init`/`apply`/`l2_penalty` follow the family protocol, so an ensemble
    can also be trained jointly through `train.fit`, grafted into a
    UnifiedPoseModel, sharded by the TP rules, and exported to H5 (members
    side by side + a Keras `Average` layer, or Concatenate + a fixed 1x1
    Conv2D carrying the stack weights).
    """

    members: tuple[Any, ...]
    # stacked combination: per-member (w_yaw, w_pitch, w_roll); None = average
    weights: tuple[tuple[float, float, float], ...] | None = None
    bias: tuple[float, float, float] | None = None

    def __post_init__(self):
        if not self.members:
            raise ValueError("EnsembleHead needs at least one member")
        feats = {m.in_features for m in self.members}
        if len(feats) != 1:
            raise ValueError(f"members disagree on in_features: {sorted(feats)}")
        if self.weights is not None:
            if len(self.weights) != len(self.members):
                raise ValueError(
                    f"{len(self.weights)} weight rows for "
                    f"{len(self.members)} members")
            if any(len(w) != 3 for w in self.weights):
                raise ValueError("each weight row must be (yaw, pitch, roll)")
        if self.bias is not None:
            if self.weights is None:
                raise ValueError("bias requires weights (a stacked ensemble)")
            if len(self.bias) != 3:
                raise ValueError("bias must be (yaw, pitch, roll)")

    @property
    def in_features(self) -> int:
        return self.members[0].in_features

    @property
    def spatial_context(self) -> bool:
        """True when ANY member couples spatial positions on a map input
        (SE gating / token attention) — such an ensemble computes a
        different function map-grafted than per-vector, and should serve
        under the detector's survivors profile (head_eval='auto' does
        this).  Unknown protocol members without the attribute count as
        spatial (conservative: their map behavior is unverified)."""
        return any(getattr(m, "spatial_context", True) for m in self.members)

    def init(self, key) -> Params:
        return {"members": [m.init(jax.random.fold_in(key, i))
                            for i, m in enumerate(self.members)]}

    def apply(self, params: Params, x, *, train: bool = False, rng=None):
        if train or rng is not None:
            # training path: sequential members, per-member dropout streams
            acc = None
            for i, (m, p) in enumerate(zip(self.members, params["members"])):
                r = None if rng is None else jax.random.fold_in(rng, i)
                y = m.apply(p, x, train=train, rng=r)
                if self.weights is not None:
                    y = y * jnp.asarray(self.weights[i], y.dtype)
                acc = y if acc is None else acc + y
        else:
            acc = self._apply_grouped(params, x)
        if self.weights is None:
            return acc / len(self.members)
        if self.bias is not None:
            acc = acc + jnp.asarray(self.bias, acc.dtype)
        return acc

    def _apply_grouped(self, params: Params, x):
        """Inference path: members with IDENTICAL specs evaluate as ONE
        vmapped program over their stacked params.

        K tiny per-member matmul chains (e.g. (B*S,96)x(96,128)) underuse
        the MXU and pay K dispatch/fusion slots; batching a group of k
        identical members lowers to ONE batched dot_general per layer.
        Measured on-chip: the 99-member unified-best pipeline improves from
        3.0x to 1.87x the flagship's dispatch time (~29.5k -> ~47k
        frames/s; docs/unified_best_cost.json).  Float effect: per-member
        math is unchanged (a batched dot is the same contraction); only the
        member-sum association differs (grouped then cross-group, in
        first-appearance order) — a ~1e-7 relative reassociation, which is
        why the training path (whose step-for-step trajectories are gated
        bit-tight) keeps the sequential order.

        Measured-negative follow-up (do not redo): merging HETEROGENEOUS
        MLP specs into width-bucketed zero-padded supergroups (identity
        depth-tails, one batched chain per bucket — 12 distinct unified-best
        MLP chains down to 2) is exact but SLOWER on-chip: paired probes
        measured unified-best at 2.1-2.6x flagship vs 1.71x without it.
        The stacks are bound by their (k, N, W) activation slabs in HBM,
        not by chain count — padding widths 32-64 up to 128 inflates that
        traffic ~1.5x, and the layer-0 wide-GEMM variant pays another two
        materializations of the slab in relayouts (docs/BENCH.md
        'Survivors-only head evaluation', git history for the kernels)."""
        # group by VALUE equality with a linear scan (trace-time only, K<=
        # ~100): members are typed by protocol, not base class, so specs
        # need not be hashable (a non-frozen dataclass has __hash__ = None)
        reps: list[Any] = []
        idx_groups: list[list[int]] = []
        for i, m in enumerate(self.members):
            for j, r in enumerate(reps):
                if m == r:
                    idx_groups[j].append(i)
                    break
            else:
                reps.append(m)
                idx_groups.append([i])
        acc = None
        for m, idx in zip(reps, idx_groups):
            plist = [params["members"][i] for i in idx]
            if len(idx) == 1:
                y = m.apply(plist[0], x)
                if self.weights is not None:
                    y = y * jnp.asarray(self.weights[idx[0]], y.dtype)
            else:
                stacked = jax.tree.map(lambda *leaves: jnp.stack(leaves),
                                       plist[0], *plist[1:])
                ys = jax.vmap(lambda p: m.apply(p, x))(stacked)  # (k, ..., 3)
                if self.weights is not None:
                    w = jnp.asarray([self.weights[i] for i in idx], ys.dtype)
                    ys = ys * w.reshape((len(idx),)
                                        + (1,) * (ys.ndim - 2) + (3,))
                y = jnp.sum(ys, axis=0)
            acc = y if acc is None else acc + y
        return acc

    def l2_penalty(self, params: Params, rate: float):
        if rate == 0.0:
            return 0.0
        return sum(m.l2_penalty(p, rate)
                   for m, p in zip(self.members, params["members"]))


HEAD_REGISTRY = {
    "mlp": MLPHead,
    "residual_mlp": ResidualMLPHead,
    "skip_mlp": SkipMLPHead,
    "se_mlp": SEMLPHead,
    "se_transformer": SETransformerHead,
    "ensemble": EnsembleHead,
}


# ---------------------------------------------------------------------------
# Import shipped reference heads into the native MLP family
# ---------------------------------------------------------------------------

def head_from_h5(path: str) -> tuple[MLPHead, Params]:
    """Load a reference 1x1-conv-chain head H5 as a native MLPHead.

    Covers the entire shipped production zoo (Trained-Models-88/*,
    Trained-Models-96*/*): Conv2D(1x1) chains with optional SpatialDropout2D
    and Flatten, in any input-shape variant — making the reference's
    InputShapeConvertor workflow (fixed 1x1 → dynamic HxW) unnecessary here.
    Raises ValueError for non-chain architectures (use core.load_graph_model
    for those).
    """
    from ..core.h5io import read_model

    return mlp_head_from_modeldef(read_model(path))


def head_from_keras_json(path: str, key=None) -> tuple[MLPHead, Params]:
    """Architecture-only import of a Keras model.json (the reference's
    load_model_from_json, Model-88/utilities.py:40-44): build the equivalent
    native MLPHead spec and Glorot-initialize fresh params."""
    import json

    with open(path) as f:
        cfg = json.load(f)
    layers_cfg = cfg["config"]["layers"]
    in_features = None
    layers: list[tuple[int, str]] = []
    dropout = 0.0
    for l in layers_cfg:
        cls, c = l["class_name"], l.get("config", {})
        if cls == "InputLayer":
            in_features = int((c.get("batch_input_shape")
                               or c["batch_shape"])[-1])
        elif cls == "Conv2D":
            layers.append((int(c["filters"]), c.get("activation") or "linear"))
        elif cls == "Dense":
            layers.append((int(c["units"]), c.get("activation") or "linear"))
        elif cls == "SpatialDropout2D":
            dropout = max(dropout, float(c.get("rate", 0.0)))
        elif cls in ("Dropout", "Flatten", "Reshape"):
            continue
        else:
            raise ValueError(f"{path}: layer {cls} is not part of an MLP chain")
    if in_features is None:
        raise ValueError(f"{path}: no InputLayer found")
    spec = MLPHead(in_features=in_features, layers=tuple(layers),
                   dropout_rate=dropout)
    if key is None:
        key = jax.random.PRNGKey(0)
    return spec, spec.init(key)


def se_transformer_from_h5(path: str) -> tuple[SETransformerHead, Params]:
    """Import a reference SE-Transformer head H5 into the native head.

    Notable: the reference's own toolchain cannot load these artifacts in a
    modern environment — their Lambda layers carry Python-version-pinned
    marshal bytecode that tf-keras fails to deserialize ('bad marshal data').
    The native import reads weights directly and maps them onto
    SETransformerHead, whose reshapes replace the Lambdas.
    """
    from ..core.h5io import read_model

    md = read_model(path)
    dense, convs, lns, mha = [], [], [], None
    in_features = None
    for name in md.order:
        layer = md.layers[name]
        cls = layer.class_name
        if cls == "InputLayer":
            in_features = int((layer.config.get("batch_input_shape")
                               or layer.config["batch_shape"])[-1])
        elif cls == "Dense":
            dense.append((layer.weights["kernel"], layer.weights["bias"],
                          layer.config.get("activation")))
        elif cls == "Conv2D":
            k = np.asarray(layer.weights["kernel"])
            convs.append((k[0, 0], layer.weights["bias"]))
        elif cls == "LayerNormalization":
            lns.append((layer.weights["gamma"], layer.weights["beta"]))
        elif cls == "MultiHeadAttention":
            mha = layer.weights
    if mha is None or len(dense) != 4 or len(convs) != 2 or len(lns) != 2:
        raise ValueError(f"{path}: not an SE-Transformer head "
                         f"(dense={len(dense)}, convs={len(convs)}, lns={len(lns)})")
    if in_features is None:
        raise ValueError(f"{path}: no InputLayer — cannot infer in_features")

    qk = np.asarray(mha["query/kernel"])  # (C, H, D)
    C, Hn, D = qk.shape
    se1, se2, ff1, ff2 = dense
    spec = SETransformerHead(
        in_features=in_features,
        reduction=in_features // se1[0].shape[1],
        num_heads=Hn, key_dim=D,
        ff_dim=ff1[0].shape[1],
        hidden=convs[0][0].shape[1],
        out_features=convs[1][0].shape[1])

    def dn(w, b):
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    params: Params = {
        "se": {"fc1": dn(se1[0], se1[1]), "fc2": dn(se2[0], se2[1])},
        "query": dn(mha["query/kernel"], mha["query/bias"]),
        "key": dn(mha["key/kernel"], mha["key/bias"]),
        "value": dn(mha["value/kernel"], mha["value/bias"]),
        "attn_out": dn(mha["attention_output/kernel"],
                       mha["attention_output/bias"]),
        "ln1": {"g": jnp.asarray(lns[0][0]), "b": jnp.asarray(lns[0][1])},
        "ff1": dn(ff1[0], ff1[1]),
        "ff2": dn(ff2[0], ff2[1]),
        "ln2": {"g": jnp.asarray(lns[1][0]), "b": jnp.asarray(lns[1][1])},
        "fc": dn(*convs[0]),
        "out": dn(*convs[1]),
    }
    return spec, params


def mlp_head_from_modeldef(md) -> tuple[MLPHead, Params]:
    """Convert a parsed 1x1-conv-chain ModelDef (possibly a nested submodel of
    a unified model) into (MLPHead spec, params)."""
    path = md.name
    layers: list[tuple[int, str]] = []
    params: list[Params] = []
    in_features = None
    for name in md.order:
        layer = md.layers[name]
        cls = layer.class_name
        if cls == "InputLayer":
            shape = (layer.config.get("batch_input_shape")
                     or layer.config.get("batch_shape"))
            in_features = int(shape[-1])
        elif cls == "Conv2D":
            k = np.asarray(layer.weights["kernel"])
            if k.shape[0] != 1 or k.shape[1] != 1:
                raise ValueError(f"{path}: non-1x1 conv in head ({k.shape})")
            params.append({"w": jnp.asarray(k[0, 0]),
                           "b": jnp.asarray(layer.weights["bias"])})
            layers.append((k.shape[-1], layer.config.get("activation") or "linear"))
        elif cls == "Dense":
            params.append({"w": jnp.asarray(layer.weights["kernel"]),
                           "b": jnp.asarray(layer.weights["bias"])})
            layers.append((params[-1]["w"].shape[-1],
                           layer.config.get("activation") or "linear"))
        elif cls in ("SpatialDropout2D", "Dropout", "Flatten", "Reshape"):
            continue  # identity at inference / shape bookkeeping only
        else:
            raise ValueError(f"{path}: layer {cls} is not part of an MLP chain")
    if in_features is None:
        raise ValueError(f"{path}: no InputLayer found")
    if params and int(params[0]["w"].shape[0]) != in_features:
        # e.g. Flatten of a >1x1 spatial input feeding a Dense: the kernel's
        # input dim disagrees with the channel count and the spec would
        # silently mismatch the imported weights
        raise ValueError(
            f"{path}: first layer expects {int(params[0]['w'].shape[0])} "
            f"input features but the InputLayer provides {in_features} "
            "channels — not a per-cell MLP chain")
    spec = MLPHead(in_features=in_features, layers=tuple(layers))
    return spec, {"layers": params}
