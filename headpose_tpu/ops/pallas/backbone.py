"""Fused BlazeFace backbone kernel (Pallas / TPU).

The XLA backbone round-trips every layer's activation through HBM — at batch
512 the early 64x64 feature maps are ~100-200 MB per layer, making the
forward HBM-bound.  This kernel runs the ENTIRE backbone (stem + 16
BlazeBlocks) for a tile of images with all activations AND all weights
resident in VMEM: HBM sees the input frames once and the two output feature
maps once.

Conv strategy inside Mosaic (no conv primitive):
  * pointwise 1x1  → one MXU matmul (tile·H·W, Cin) @ (Cin, Cout)
  * depthwise 3x3  → 9 shifted multiply-accumulates on a zero-padded VMEM
    scratch copy (VPU); stride 2 via reshape-based decimation
  * stem 5x5 s2    → 25 shifted (Cin=3 → Cout=24) matmuls on decimated slices
  * maxpool 2x2    → max of 4 decimated slices
  * channel pad    → concat zeros (skip-connection growth)

Numerics: all matmuls use preferred_element_type=f32 with HIGHEST precision —
output matches the XLA backbone at f32 to 3e-6 (see tests/test_pallas.py).

STATUS: validated in interpret mode; this container's remote Mosaic compiler
(tpu_compile_helper) crashes (HTTP 500, no diagnostics) on the depthwise
pattern.  Probe bisection results (2026-08-16, jax 0.9.0 / axon tunnel):
  OK    : jnp.pad, single shifted slice of a padded array, 2-term shifted
          sum, broadcast row multiply, reshape-decimation, plain MXU matmul,
          3-pass split-float matmul (maxerr 1.5e-4 vs f64)
  CRASH : (shifted slice) x (broadcast row); >2-term shifted accumulation;
          any matmul with precision=HIGHEST (use the 3-pass split instead)
Revisit when the toolchain updates; until then the XLA backbone is the
production path and this kernel is opt-in/interpret.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.blazeface import BlazeFace

__all__ = ["backbone_forward"]

_PREC = jax.lax.Precision.HIGHEST


def _decimate(x, di: int, dj: int):
    """x (T, 2H, 2W, C) → x[:, di::2, dj::2, :] via reshape (Mosaic-safe)."""
    T, H2, W2, C = x.shape
    return x.reshape(T, H2 // 2, 2, W2 // 2, 2, C)[:, :, di, :, dj, :]


def _pointwise(x, w, b):
    """(T, H, W, Cin) @ (Cin, Cout) + b."""
    T, H, W, Ci = x.shape
    y = jax.lax.dot_general(x.reshape(T * H * W, Ci), w,
                            (((1,), (0,)), ((), ())),
                            precision=_PREC,
                            preferred_element_type=jnp.float32)
    return (y + b).reshape(T, H, W, w.shape[1])


def _pad_hw(x, pad: int = 1):
    """Zero-pad the two spatial dims."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))


def _depthwise3x3(x, w, b, stride: int):
    """Depthwise 3x3 SAME conv.  w (3, 3, C), b (C,)."""
    T, H, W, C = x.shape
    if stride == 1:
        p = _pad_hw(x)
        acc = jnp.zeros_like(x)
        for di in range(3):
            for dj in range(3):
                acc = acc + p[:, di:di + H, dj:dj + W, :] * w[di, dj]
        return acc + b
    # stride 2, SAME, k=3, even input: pad_total = 1 → top/left 0, bottom/
    # right 1.  Output (i, j) reads input rows 2i + di for di in 0..2.
    p = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    Ho, Wo = H // 2, W // 2
    acc = jnp.zeros((T, Ho, Wo, C), x.dtype)
    for di in range(3):
        for dj in range(3):
            sl = p[:, di:di + H, dj:dj + W, :]
            acc = acc + _decimate(sl, 0, 0) * w[di, dj]
    return acc + b


def _maxpool2(x):
    T, H, W, C = x.shape
    r = x.reshape(T, H // 2, 2, W // 2, 2, C)
    return jnp.maximum(jnp.maximum(r[:, :, 0, :, 0], r[:, :, 0, :, 1]),
                       jnp.maximum(r[:, :, 1, :, 0], r[:, :, 1, :, 1]))


def _stem5x5s2(x, w, b):
    """5x5 stride-2 conv, SAME, 128→64.  w (5, 5, 3, 24).

    SAME with k=5, s=2, in=128, out=64: pad_total=3 → top/left 1, bottom/right 2.
    Tap (di, dj) at output (i, j) reads input row 2i + di - 1."""
    T, H, W, Ci = x.shape
    p = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))  # extra to keep slices in range
    Ho, Wo = H // 2, W // 2
    acc = jnp.zeros((T, Ho, Wo, w.shape[3]), x.dtype)
    for di in range(5):
        for dj in range(5):
            sl = _decimate(p[:, di:di + H, dj:dj + W, :], 0, 0)  # (T,64,64,3)
            acc = acc + jax.lax.dot_general(
                sl.reshape(T * Ho * Wo, Ci), w[di, dj],
                (((1,), (0,)), ((), ())), precision=_PREC,
                preferred_element_type=jnp.float32).reshape(T, Ho, Wo, -1)
    return acc + b


def _make_kernel(spec: BlazeFace):
    downsample = set(spec.downsample_blocks)
    n_blocks = len(spec.block_channels)

    def kernel(x_ref, *refs):
        # refs layout: stem_k, stem_b, then per block (dw_k, dw_b, pw_k, pw_b),
        # then out88_ref, out96_ref
        out88_ref, out96_ref = refs[-2], refs[-1]
        y = jax.nn.relu(_stem5x5s2(x_ref[:], refs[0][:], refs[1][:]))
        cin = spec.stem_features
        for i in range(n_blocks):
            dw_k = refs[2 + 4 * i][:]
            dw_b = refs[3 + 4 * i][:]
            pw_k = refs[4 + 4 * i][:]
            pw_b = refs[5 + 4 * i][:]
            cout = spec.block_channels[i]
            stride = 2 if i in downsample else 1
            t = _depthwise3x3(y, dw_k, dw_b, stride)
            t = _pointwise(t, pw_k, pw_b)
            skip = _maxpool2(y) if stride == 2 else y
            if cout > cin:
                skip = jnp.pad(skip, ((0, 0), (0, 0), (0, 0), (0, cout - cin)))
            y = jax.nn.relu(t + skip)
            if i == spec.tap88_block:
                out88_ref[:] = y
            cin = cout
        out96_ref[:] = y

    return kernel


@functools.partial(jax.jit, static_argnames=("spec", "tile", "interpret"))
def backbone_forward(spec: BlazeFace, params, x, *,
                     tile: int = 4, interpret: bool = False):
    """Fused backbone: x (B, 128, 128, 3) → (feat88 (B,16,16,88),
    feat96 (B,8,8,96)).  Images are processed `tile` at a time; weights stay
    VMEM-resident across the whole grid."""
    B, H, W, _ = x.shape
    assert H == spec.input_size and W == spec.input_size
    pad = (-B) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    total = x.shape[0]

    args = [params["stem"]["kernel"], params["stem"]["bias"].reshape(1, -1)]
    for blk in params["blocks"]:
        kh, kw, _, c = blk["dw_kernel"].shape
        args += [blk["dw_kernel"].reshape(kh, kw, c), blk["dw_bias"],
                 blk["pw_kernel"].reshape(blk["pw_kernel"].shape[2],
                                          blk["pw_kernel"].shape[3]),
                 blk["pw_bias"].reshape(1, -1)]

    in_specs = [pl.BlockSpec((tile, H, W, 3), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for a in args]

    c88 = spec.block_channels[spec.tap88_block]
    c96 = spec.block_channels[-1]
    s88 = H // 8
    s96 = H // 16
    out88, out96 = pl.pallas_call(
        _make_kernel(spec),
        grid=(total // tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((tile, s88, s88, c88), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, s96, s96, c96), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((total, s88, s88, c88), jnp.float32),
            jax.ShapeDtypeStruct((total, s96, s96, c96), jnp.float32),
        ),
        interpret=interpret,
    )(x, *args)
    return out88[:B], out96[:B]
