"""Native BlazeFace backbone + SSD heads (TPU-first, batch-polymorphic).

The reference ships this network only as Keras-H5 weights (no source; layer
table recovered in SURVEY.md §2.4 and verified by execution).  Architecture:

  128x128x3 → 5x5/2 conv (24ch, relu) → 16 BlazeBlocks:
    channels 24,28,32*,36,42,48*,56,64,72,80,88,96*,96,96,96,96
    (* = stride-2 downsample)
  A BlazeBlock is depthwise-3x3 + pointwise-1x1 with a residual skip; the
  skip is max-pooled on downsample blocks and zero-padded on the channel axis
  when channels grow (the tf_op_layer_Pad nodes of the H5 graph), then ReLU.

Taps and heads (names refer to the reference H5 / JoinModels.py:117-118):
  * feat88 = 16x16x88 map (re_lu_10) — input of the Model-88 pose heads and
    of cls_front (1x1→2ch) / loc_front (1x1→32ch) SSD heads
  * feat96 = 8x8x96 map (re_lu_15) — input of the Model-96 pose heads and of
    cls_back (1x1→6ch) / loc_back (1x1→96ch)

The forward returns decode-ready tensors: scores logits (B, 896) and raw loc
(B, 896, 16) — the anchor-major flattening matches the reference's output
reshapes (tf_op_layer_classificators/regressors, verified against golden
fixtures) — plus both feature maps for pose-head grafting.

Design notes: one jitted NHWC conv pipeline; activations can run in bfloat16
(params stay f32, cast at trace time — XLA folds it); channel sizes are
MXU-unfriendly (24..96) but the convs are small enough that HBM bandwidth,
not the MXU, bounds this network, so fusion matters more than padding to 128.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BlazeFace", "BLAZEFACE_FRONT", "BLAZEFACE_BACK", "blazeface_from_h5"]

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class BlazeFace:
    """BlazeFace front-camera detector configuration."""

    input_size: int = 128
    stem_features: int = 24
    block_channels: tuple[int, ...] = (24, 28, 32, 36, 42, 48, 56, 64,
                                       72, 80, 88, 96, 96, 96, 96, 96)
    downsample_blocks: tuple[int, ...] = (2, 5, 11)  # stride-2 block indices
    tap88_block: int = 10   # output of this block = 16x16x88 feature map
    cls_channels: tuple[int, int] = (2, 6)    # anchors per cell, front/back grid
    loc_channels: tuple[int, int] = (32, 96)  # 16 values * anchors per cell

    # ------------------------------------------------------------------ init
    def init(self, key) -> Params:
        def conv_init(k, kh, kw, cin, cout):
            fan_in, fan_out = kh * kw * cin, kh * kw * cout
            lim = math.sqrt(6.0 / (fan_in + fan_out))
            return {"kernel": jax.random.uniform(k, (kh, kw, cin, cout),
                                                 jnp.float32, -lim, lim),
                    "bias": jnp.zeros((cout,), jnp.float32)}

        keys = jax.random.split(key, 2 * len(self.block_channels) + 5)
        params: Params = {"stem": conv_init(keys[0], 5, 5, 3, self.stem_features)}
        blocks = []
        cin = self.stem_features
        for i, cout in enumerate(self.block_channels):
            kd, kp = keys[1 + 2 * i], keys[2 + 2 * i]
            dw_lim = math.sqrt(6.0 / (9 * cin + 9))
            blocks.append({
                "dw_kernel": jax.random.uniform(kd, (3, 3, 1, cin),
                                                jnp.float32, -dw_lim, dw_lim),
                "dw_bias": jnp.zeros((cin,), jnp.float32),
                **{f"pw_{k}": v for k, v in conv_init(kp, 1, 1, cin, cout).items()},
            })
            cin = cout
        params["blocks"] = blocks
        c88 = self.block_channels[self.tap88_block]
        c96 = self.block_channels[-1]
        params["cls_front"] = conv_init(keys[-4], 1, 1, c88, self.cls_channels[0])
        params["cls_back"] = conv_init(keys[-3], 1, 1, c96, self.cls_channels[1])
        params["loc_front"] = conv_init(keys[-2], 1, 1, c88, self.loc_channels[0])
        params["loc_back"] = conv_init(keys[-1], 1, 1, c96, self.loc_channels[1])
        return params

    # --------------------------------------------------------------- forward
    def apply(self, params: Params, x, *, dtype=None,
              dense: bool = False,
              fast_blocks: tuple[int, ...] | None = None,
              simulate_fast: bool | str = False,
              tap_blocks: tuple[int, ...] = ()) -> dict[str, jax.Array]:
        """x: (B, 128, 128, 3) in [-1, 1].  Returns dict with feat88, feat96,
        scores (B, 896) logits, and loc (B, 896, 16) raw offsets.

        dense=True composes each block's depthwise3x3+pointwise1x1 into ONE
        dense 3x3 conv (exact — there is no nonlinearity between them:
        K[a,b,ci,co] = dw[a,b,ci]*pw[ci,co]).  On TPU this halves the HBM
        round-trips of the intermediate maps and, combined with 'high'
        matmul precision, runs ~25% faster than the separable form at
        ~2.5e-4 feature error (docs/BENCH.md).

        fast_blocks runs the listed block indices (and, if any are listed,
        the SSD heads) at the MXU's single-pass bf16 precision while the
        other stages keep the ambient precision — precision islands.  On
        TPU the 3-pass ambient tax is concentrated in the MANY small tail
        convs (latency-bound, so 3 passes cost ~3x), while accuracy is
        dominated by the stem/early blocks and the convs feeding the
        feat88/feat96 pose taps (rounding there is amplified through the
        un-normalized conv stack).  The 'turbo' serving mode picks the
        measured-safe set (docs/BENCH.md).

        tap_blocks returns the listed blocks' activation maps as extra
        'block{i}_out' entries (index -1 = the stem output) — the hooks
        stage-wise distillation aligns on (train/detector.py, scripts/
        distill_back.py).

        simulate_fast=True replaces each fast-island conv by an explicit
        bf16-rounding model of the MXU single-pass mode (round operands to
        bf16, accumulate f32 at HIGHEST) — differentiable (straight-through)
        and faithful on CPU (verified bit-exact to the real DEFAULT island
        on the chip); the training path of train/calibrate.py.  The strings
        'weights' / 'acts' round only that operand — the error-decomposition
        probes behind the turbo-island choice (docs/BENCH.md)."""
        if dtype is not None:
            params = jax.tree_util.tree_map(lambda a: a.astype(dtype), params)
            x = x.astype(dtype)

        fast = jax.lax.Precision.DEFAULT

        def conv(p, v, stride=1, padding="SAME", groups=1, precision=None):
            k = p[0]
            if simulate_fast and precision is fast:
                # Explicit model of the MXU's single-pass mode: round operands
                # to bf16 (astype is straight-through under autodiff) and
                # accumulate in f32.  Faithful on CPU; the differentiable
                # training path of train/calibrate.py.
                if simulate_fast != "acts":
                    k = k.astype(jnp.bfloat16).astype(v.dtype)
                if simulate_fast != "weights":
                    v = v.astype(jnp.bfloat16).astype(v.dtype)
                precision = jax.lax.Precision.HIGHEST
            return jax.lax.conv_general_dilated(
                v, k, (stride, stride), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups, precision=precision) + p[1]
        fastset = frozenset(fast_blocks) if fast_blocks is not None else frozenset()

        y = jax.nn.relu(conv((params["stem"]["kernel"], params["stem"]["bias"]),
                             x, stride=2))
        taps: dict[str, jax.Array] = {}
        if -1 in tap_blocks:
            taps["block-1_out"] = y
        feat88 = None
        for i, (blk, cout) in enumerate(zip(params["blocks"], self.block_channels)):
            cin = y.shape[-1]
            stride = 2 if i in self.downsample_blocks else 1
            prec = fast if i in fastset else None
            if dense:
                dwk = blk["dw_kernel"].reshape(3, 3, cin)
                pwk = blk["pw_kernel"].reshape(cin, cout)
                t = conv((dwk[:, :, :, None] * pwk[None, None, :, :],
                          blk["dw_bias"] @ pwk + blk["pw_bias"]), y,
                         stride=stride, precision=prec)
            else:
                t = conv((blk["dw_kernel"], blk["dw_bias"]), y,
                         stride=stride, groups=cin, precision=prec)
                t = conv((blk["pw_kernel"], blk["pw_bias"]), t, precision=prec)
            skip = y
            if stride == 2:
                skip = jax.lax.reduce_window(skip, -jnp.inf, jax.lax.max,
                                             (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
            if cout > cin:
                skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, cout - cin)))
            y = jax.nn.relu(t + skip)
            if i == self.tap88_block:
                feat88 = y
            if i in tap_blocks:
                taps[f"block{i}_out"] = y
        feat96 = y

        B = x.shape[0]
        hp = fast if fastset else None
        cls_f = conv((params["cls_front"]["kernel"], params["cls_front"]["bias"]), feat88, precision=hp)
        cls_b = conv((params["cls_back"]["kernel"], params["cls_back"]["bias"]), feat96, precision=hp)
        loc_f = conv((params["loc_front"]["kernel"], params["loc_front"]["bias"]), feat88, precision=hp)
        loc_b = conv((params["loc_back"]["kernel"], params["loc_back"]["bias"]), feat96, precision=hp)

        scores = jnp.concatenate(
            [cls_f.reshape(B, -1), cls_b.reshape(B, -1)], axis=1)
        loc = jnp.concatenate(
            [loc_f.reshape(B, -1, 16), loc_b.reshape(B, -1, 16)], axis=1)
        return {"feat88": feat88, "feat96": feat96,
                "scores": scores, "loc": loc, **taps}


BLAZEFACE_FRONT = BlazeFace()

# The single-pass-bf16 island for the 'turbo' serving mode: the last
# downsample block, the block feeding it, and the final-stage (8x8) blocks +
# SSD heads.  Certified on the 112-image parity corpus (round 3,
# docs/certification.json): pose error p99 0.22 / max 4.2 deg — OUTSIDE the
# 0.1-deg parity budget (round 2's "0.0696 deg" was a 3-image max).  The
# island-width probes (docs/turbo_island_probe.json) show every island
# touching any backbone block lands at p99 0.13-0.19 deg — bf16 rounding of
# the un-normalized tail features costs ~0.1 deg alone — so 'turbo' is an
# accuracy-mode (non-parity) knob and THIS island (the fastest; narrower ones
# are no more accurate) stays its definition.  Detection sets stay identical
# to the reference in every probed island.
def turbo_fast_blocks(spec: BlazeFace) -> tuple[int, ...]:
    """Block indices of the trailing bf16 island (see above — a non-parity
    accuracy/speed trade certified on the corpus for the front spec; for
    BLAZEFACE_BACK — which the reference ships no weights for — the
    island is measured on-chip relative to the model's own 'highest' at
    BOTH random init (structural propagation: pose p99 8e-4 deg) and the
    shipped distilled weights (trained dynamic range: fast p99 ~0.007,
    turbo ~0.38, max ~1.0 deg — same ordering/magnitude as the front
    certification), scripts/certify_back.py →
    docs/certification_back.json; neither is a reference-parity
    certificate since no reference back model exists)."""
    return tuple(range(spec.downsample_blocks[-1] - 1, len(spec.block_channels)))


TURBO_FAST_BLOCKS = turbo_fast_blocks(BLAZEFACE_FRONT)  # (10, 11, ..., 15)

# Back-camera variant: the reference reserves the 256-input back model
# (INPUT_BACK=256, blazeFaceDetectorH5.py:11) but ships neither weights nor a
# runtime path for it.  The spec follows the MediaPipe back-camera topology:
# same stem and BlazeBlock structure with ONE extra stride-2 stage so the SSD
# grids land on 16x16 (stride 16) and 8x8 (stride 32) of the 256 input —
# matching the 896-anchor table of anchors.BACK_CONFIG (16*16*2 + 8*8*6).
# Resolution walk: 256 → stem/2 → 128 → ds@0 → 64 → ds@3 → 32 → ds@6 → 16
# (tap88 at block 11, 88ch) → ds@12 → 8 (96ch).  The reference ships no
# weights for it; ours are trained by distillation from the front flagship
# (pretrained_models/unified-back-distilled, scripts/distill_back.py — a
# topology bring-up on synthetic imagery, not a real-world back-camera
# model; retrain with fit_detector/distill_detector when real data appears).
BLAZEFACE_BACK = BlazeFace(
    input_size=256,
    block_channels=(24, 24, 28, 32, 36, 42, 48, 56, 64,
                    72, 80, 88, 96, 96, 96, 96, 96),
    downsample_blocks=(0, 3, 6, 12),
    tap88_block=11,
)


def blazeface_from_h5(path: str) -> tuple[BlazeFace, Params]:
    """Import backbone + SSD head weights from a reference unified H5
    (BlazePoser/UnifiedModels/*.h5) into the native parameter pytree."""
    from ..core.h5io import read_model

    return blazeface_from_modeldef(read_model(path))


def blazeface_from_modeldef(md) -> tuple[BlazeFace, Params]:
    """Same import from an already-parsed core.h5io.ModelDef — lets callers
    that also need the graph (unified_from_h5) parse the multi-MB H5 once."""

    def w(layer: str) -> dict[str, np.ndarray]:
        return md.layers[layer].weights

    spec = BLAZEFACE_FRONT
    params: Params = {"stem": {"kernel": jnp.asarray(w("conv2d")["kernel"]),
                               "bias": jnp.asarray(w("conv2d")["bias"])}}
    blocks = []
    for i in range(len(spec.block_channels)):
        dw = w(f"depthwise_conv2d_{i}" if i else "depthwise_conv2d")
        pw = w(f"conv2d_{i + 1}")
        dwk = np.asarray(dw["depthwise_kernel"])  # (3,3,Cin,1) → (3,3,1,Cin)
        blocks.append({
            "dw_kernel": jnp.asarray(dwk.reshape(3, 3, 1, dwk.shape[2])),
            "dw_bias": jnp.asarray(dw["bias"]),
            "pw_kernel": jnp.asarray(pw["kernel"]),
            "pw_bias": jnp.asarray(pw["bias"]),
        })
    params["blocks"] = blocks
    for name, layer in [("cls_front", "conv2d_17"), ("cls_back", "conv2d_18"),
                        ("loc_front", "conv2d_19"), ("loc_back", "conv2d_20")]:
        params[name] = {"kernel": jnp.asarray(w(layer)["kernel"]),
                        "bias": jnp.asarray(w(layer)["bias"])}
    return spec, params
