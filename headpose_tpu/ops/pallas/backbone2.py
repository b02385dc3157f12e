"""Fused BlazeFace backbone kernels, take 2 (Pallas / Mosaic, TPU v5e).

Round-1's kernel (backbone.py) kept the reference NHWC layout (channels in
lanes: up to 5x pad waste) and crashed this container's Mosaic compiler.
This redesign picks layouts so every hot op is Mosaic-friendly AND the MXU
padding is filled with useful work:

* Activations are CHANNEL-MAJOR FLAT-GAPPED: (C8, LqP) f32 per image, C8 = C
  rounded up to 8 sublanes, Lq = (H+2)^2 flattening a zero-bordered grid into
  lanes (LqP = Lq rounded to 128).  Lanes carry the big spatial dim -> no pad
  waste; the zero border makes every 3x3 tap a CONTIGUOUS STATIC SLICE:
  buf[:, OUT0+d : OUT0+d+OUTLEN], d = (a-1)*Wp + (b-1).  Max tap read index
  is exactly Lq, so taps never cross into a neighboring image -> T images
  can be LANE-COALESCED per grid step (stride LqP), amortizing the ~5us
  per-step pipeline overhead and growing every matmul's N by T.
* High-res segments use SPACE-TO-DEPTH "plane-2" layout: the 4 spatial-parity
  planes of the H x H map stacked along sublanes, (4*C8, T*LqP) gapped at
  H/2.  The pointwise conv becomes ONE block-diagonal (I4 (x) W) matmul:
  with C8 = 24..48, 4*C8 fills the MXU's 128-wide M/K tiles that a flat
  layout would pad with zeros — ~4x fewer executed MXU FLOPs at 64x64.
  Stride-2 blocks read parity planes directly (decimation = plane selection
  + static slice; Mosaic cannot reshape/stride the lane dim, so this layout
  is also what makes s2 compilable at all).
* Depthwise 3x3 = 9 slice x per-sublane-scalar MACs on the VPU in exact f32.
* Pointwise 1x1 = 3-pass split-bf16 MXU matmul (x_hi@w_hi + x_lo@w_hi +
  x_hi@w_lo), maxerr ~1.5e-4 == 'high' precision == 0.0024 deg end-to-end
  pose error (docs/BENCH.md) — inside the 0.1 deg budget.  2-pass is not
  enough (~0.4% -> degrees of pose error); precision=HIGHEST matmuls crash
  Mosaic outright.
* Gap/garbage lanes are re-zeroed once per block with an iota-mask
  jnp.where (not multiply: stale-scratch garbage can be nan and nan*0=nan).

The backbone fuses into FOUR kernels split at the downsample boundaries:
  A: blocks 0,1 (plane-2 @64) + block 2 (s2 from planes)   -> flat 32x32
  B: blocks 3,4 (plane-2 @32) + block 5 (s2 from planes)   -> flat 16x16
  C: blocks 6..10 (flat @16)                               -> feat88
  D: blocks 12..15 (flat @8)                               -> feat96
with the stem (5x5 s2, 3 input channels — MXU-hostile in any layout) and
block 11 (s2 @16, consuming feat88 which exits to the SSD heads anyway) in
XLA.  All XLA bridges stay channel-major (NCHW): pad/strided-slice/reshape
only, no NHWC transposes (those cost ~5 ms/512-batch).

Mosaic pitfalls encoded here (probed on this container, 2026-08-16):
  - jnp.pad on sublanes concats a fresh zeros vector whose layout offset
    mismatches a sliced operand's -> zero a slice of the operand instead
    (_grow_rows).
  - jnp.concatenate of per-plane accumulators carrying different dominant
    tap-slice lane offsets -> stack through a VMEM scratch ref instead
    (stores normalize layouts).
  - x[:, i, :, j] int-pair indexing lowers to an unsupported gather ->
    range-slice + reshape.
  - reshapes/strides on the LANE dim are unsupported -> the plane-2 layout.

Reference behavior: the weights-only backbone of
/root/reference/BlazePoser/UnifiedModels/*.h5 (SURVEY.md section 2.4);
depthwise/pointwise/residual semantics as models/blazeface.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.blazeface import BlazeFace

__all__ = ["apply_fused", "pack_backbone", "run_segment", "SEGMENTS"]

_TAPS = tuple((a, b) for a in range(3) for b in range(3))


def _rup8(c: int) -> int:
    return -(-c // 8) * 8


def _rup128(n: int) -> int:
    return -(-n // 128) * 128


def _geom(h: int):
    """Flat-gap geometry for an h x h map: (Wp, Lq, LqP, OUT0, OUTLEN)."""
    wp = h + 2
    lq = wp * wp
    return wp, lq, _rup128(lq), wp + 1, (h - 1) * wp + h


# Segment table: (first_block, last_block, input res, plane input?, T/step)
# Stride-2 blocks (spec.downsample_blocks) close segments A and B; block 11
# runs in XLA (its input feat88 leaves the kernel for the SSD heads anyway).
SEGMENTS = {
    "A": (0, 2, 64, True, 8),
    "B": (3, 5, 32, True, 8),
    "C": (6, 10, 16, False, 8),
    "D": (12, 15, 8, False, 8),
}


# -------------------------------------------------------------- weight packs
def _split_bf16(w: np.ndarray):
    hi = np.asarray(w.astype(jnp.bfloat16))
    lo = np.asarray((w - np.asarray(hi, np.float32)).astype(jnp.bfloat16))
    return hi, lo


def _pack_block(blk, cin: int, cout: int, planes: bool):
    """Kernel weights for one block: dwk (Ci8, 9) f32 tap-major, dwb
    (Ci8, 1); pointwise f32 (Co8, Ci8) for VPU blocks or split-bf16 for MXU
    blocks (block-diag x4 when planes)."""
    ci8, co8 = _rup8(cin), _rup8(cout)
    dwk = np.zeros((ci8, 9), np.float32)
    dwk[:cin] = np.asarray(blk["dw_kernel"]).reshape(9, cin).T
    dwb = np.zeros((ci8, 1), np.float32)
    dwb[:cin, 0] = np.asarray(blk["dw_bias"])
    pw = np.zeros((co8, ci8), np.float32)
    pw[:cout, :cin] = np.asarray(blk["pw_kernel"]).reshape(cin, cout).T
    pwb = np.zeros((co8, 1), np.float32)
    pwb[:cout, 0] = np.asarray(blk["pw_bias"])
    if planes:
        pw = np.kron(np.eye(4, dtype=np.float32), pw)
        pwb = np.tile(pwb, (4, 1))
    w_hi, w_lo = _split_bf16(pw)
    return {"ci8": ci8, "dwk": jnp.asarray(dwk), "dwb": jnp.asarray(dwb),
            "w_hi": jnp.asarray(w_hi), "w_lo": jnp.asarray(w_lo),
            "pwb": jnp.asarray(pwb)}


def _seg_layout(spec: BlazeFace, seg: str):
    """Static per-block weight geometry for a segment: list of dicts with
    ci8 (dw rows), k/m (pointwise K/M incl. plane block-diag), koff (lane
    offset into the bf16 weight packs).  Shared by the packer and the kernel
    so slices always agree."""
    first, last, _, planes, _ = SEGMENTS[seg]
    cin = spec.stem_features if first == 0 else spec.block_channels[first - 1]
    out, koff = [], 0
    for i in range(first, last + 1):
        cout = spec.block_channels[i]
        is_plane_s1 = planes and i not in spec.downsample_blocks
        ci8, co8 = _rup8(cin), _rup8(cout)
        k = 4 * ci8 if is_plane_s1 else ci8
        m = 4 * co8 if is_plane_s1 else co8
        out.append({"ci8": ci8, "k": k, "m": m, "koff": koff,
                    "cin": cin})
        koff += k
        cin = cout
    return out


def pack_backbone(spec: BlazeFace, backbone_params) -> dict:
    """Consolidated per-segment kernel weights: THREE refs per segment (one
    f32 pack holding dwk/dwb/pwb, two bf16 packs holding the split pointwise
    weights).  Separate per-block refs cost a small constant-block DMA each
    per grid step, which measured ~100x slower than slicing packed refs."""
    packed = {}
    for seg, (first, last, _, planes, _) in SEGMENTS.items():
        lay = _seg_layout(spec, seg)
        blocks = []
        cin = (spec.stem_features if first == 0
               else spec.block_channels[first - 1])
        for i in range(first, last + 1):
            cout = spec.block_channels[i]
            is_s2 = i in spec.downsample_blocks
            blocks.append(_pack_block(backbone_params["blocks"][i],
                                      cin, cout, planes and not is_s2))
            cin = cout
        n = len(blocks)
        rows = max(max(b["ci8"], b["m"]) for b in lay)
        mrows = max(b["m"] for b in lay)
        ksum = sum(b["k"] for b in lay)
        f32p = np.zeros((rows, 11 * n), np.float32)
        w_hi = np.zeros((mrows, ksum), np.float32)
        w_lo = np.zeros((mrows, ksum), np.float32)
        for i, (blk, geo) in enumerate(zip(blocks, lay)):
            ci8, m, k, koff = geo["ci8"], geo["m"], geo["k"], geo["koff"]
            f32p[:ci8, 11 * i:11 * i + 9] = np.asarray(blk["dwk"])
            f32p[:ci8, 11 * i + 9:11 * i + 10] = np.asarray(blk["dwb"])
            f32p[:m, 11 * i + 10:11 * i + 11] = np.asarray(blk["pwb"])
            w_hi[:m, koff:koff + k] = np.asarray(blk["w_hi"], np.float32)
            w_lo[:m, koff:koff + k] = np.asarray(blk["w_lo"], np.float32)
        packed[seg] = {
            "f32": jnp.asarray(f32p),
            "w_hi": jnp.asarray(w_hi.astype(jnp.bfloat16)),
            "w_lo": jnp.asarray(w_lo.astype(jnp.bfloat16)),
        }
    return packed


# ------------------------------------------------------------ kernel helpers
def _pw_matmul(x, w_hi, w_lo, bias):
    """3-pass split-bf16 (M, K) @ (K, L) + bias, f32 accumulate."""
    dn = (((1,), (0,)), ((), ()))
    x_hi = x.astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    y = jax.lax.dot_general(w_hi, x_hi, dn, preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(w_hi, x_lo, dn,
                                preferred_element_type=jnp.float32)
    y = y + jax.lax.dot_general(w_lo, x_hi, dn,
                                preferred_element_type=jnp.float32)
    return y + bias


def _pw_apply(x, w):
    return _pw_matmul(x, w["w_hi"], w["w_lo"], w["pwb"])


def _outlen_t(h: int, t: int) -> int:
    _, _, lqp, _, outlen = _geom(h)
    return (t - 1) * lqp + outlen


def _gap_mask(h: int, t: int):
    """(1, OUTLEN_T) interior mask over T lane-coalesced images."""
    wp, _, lqp, out0, _ = _geom(h)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, _outlen_t(h, t)), 1)
    m = (col + out0) % lqp          # flat position within the image's span
    c = (m - out0 + 1) % wp
    return (m >= out0) & (m < out0 + _geom(h)[4]) & (c != 0) & (c != h + 1)


def _grow_rows(x, grow: int):
    """Append `grow` zero rows with a layout-matched operand (jnp.pad's
    fresh-zeros concat crashes Mosaic on offset mismatch)."""
    if not grow:
        return x
    return jnp.concatenate([x, x[:grow] * 0.0], axis=0)


def _tap_slice(buf, h: int, t: int, dr: int, dc: int, row0: int = 0,
               rows: int | None = None):
    """Contiguous static tap slice at row/col shift (dr, dc) across all T
    coalesced images; optionally restricted to sublanes [row0, row0+rows)."""
    wp, _, _, out0, _ = _geom(h)
    s = out0 + dr * wp + dc
    e = s + _outlen_t(h, t)
    return buf[:, s:e] if rows is None else buf[row0:row0 + rows, s:e]


def _finish_block(y, skip, h: int, t: int):
    """relu(residual) -> re-zero gaps/garbage -> re-embed gapped."""
    _, _, lqp, out0, outlen = _geom(h)
    y = jnp.where(_gap_mask(h, t), jax.nn.relu(y + skip), 0.0)
    return jnp.pad(y, ((0, 0), (out0, lqp - out0 - outlen)))


def _block_s1_flat(buf, w, h: int, t: int, grow: int):
    """Stride-1 BlazeBlock on a coalesced flat (Ci8, T*LqP) buffer."""
    acc = None
    for tap, (a, b) in enumerate(_TAPS):
        term = _tap_slice(buf, h, t, a - 1, b - 1) * w["dwk"][:, tap:tap + 1]
        acc = term if acc is None else acc + term
    acc = acc + w["dwb"]
    y = _pw_apply(acc, w)
    skip = _grow_rows(_tap_slice(buf, h, t, 0, 0), grow)
    return _finish_block(y, skip, h, t)


def _dw_plane(buf, w, h2: int, t: int, ci8: int, p: int, q: int):
    """Depthwise 3x3 for output plane (p,q): tap (a,b) reads absolute
    (2i+p+a-1, 2j+q+b-1) = plane ((p+a-1) mod 2, (q+b-1) mod 2) shifted by
    the floored halves."""
    acc = None
    for tap, (a, b) in enumerate(_TAPS):
        u, v = p + a - 1, q + b - 1
        pp, qq = u % 2, v % 2
        sl = _tap_slice(buf, h2, t, (u - pp) // 2, (v - qq) // 2,
                        row0=(2 * pp + qq) * ci8, rows=ci8)
        term = sl * w["dwk"][:, tap:tap + 1]
        acc = term if acc is None else acc + term
    return acc + w["dwb"]


def _block_s1_planes(buf, w, h2: int, t: int, ci8: int, grow: int,
                     acc_scr, skip_scr):
    """Stride-1 BlazeBlock in plane-2 layout: (4*Ci8, T*LqP@h2) -> (4*Co8, ·).

    The pointwise conv is one block-diagonal (I4 (x) W) matmul over all
    planes, stacked through VMEM scratch stores (jnp.concatenate of
    per-plane accumulators crashes Mosaic on lane-offset mismatch)."""
    olt = _outlen_t(h2, t)
    co8 = ci8 + grow
    for p in (0, 1):
        for q in (0, 1):
            plane = 2 * p + q
            acc = _dw_plane(buf, w, h2, t, ci8, p, q)
            skip = _grow_rows(
                _tap_slice(buf, h2, t, 0, 0, row0=plane * ci8, rows=ci8),
                grow)
            acc_scr[plane * ci8:(plane + 1) * ci8, :olt] = acc
            skip_scr[plane * co8:(plane + 1) * co8, :olt] = skip
    y = _pw_apply(acc_scr[:4 * ci8, :olt], w)
    return _finish_block(y, skip_scr[:4 * co8, :olt], h2, t)


def _block_s2_planes(buf, w, h2: int, t: int, ci8: int, grow: int):
    """Stride-2 BlazeBlock consuming plane-2 layout -> flat (Co8, T*LqP@h2).

    Output (i,j) reads absolute (2i+a, 2j+b) = plane (a mod 2, b mod 2)
    shifted (a//2, b//2); the maxpooled skip is the elementwise max of the
    4 planes at zero shift."""
    acc = None
    for tap, (a, b) in enumerate(_TAPS):
        sl = _tap_slice(buf, h2, t, a // 2, b // 2,
                        row0=(2 * (a % 2) + (b % 2)) * ci8, rows=ci8)
        term = sl * w["dwk"][:, tap:tap + 1]
        acc = term if acc is None else acc + term
    acc = acc + w["dwb"]
    y = _pw_apply(acc, w)
    sk = jnp.maximum(
        jnp.maximum(_tap_slice(buf, h2, t, 0, 0, row0=0, rows=ci8),
                    _tap_slice(buf, h2, t, 0, 0, row0=ci8, rows=ci8)),
        jnp.maximum(_tap_slice(buf, h2, t, 0, 0, row0=2 * ci8, rows=ci8),
                    _tap_slice(buf, h2, t, 0, 0, row0=3 * ci8, rows=ci8)))
    return _finish_block(y, _grow_rows(sk, grow), h2, t)


def _seg_row_sizes(spec: BlazeFace, seg: str):
    """(in_rows, out_rows, acc_rows, skip_rows) for a segment."""
    first, last, _, planes, _ = SEGMENTS[seg]
    cin = spec.stem_features if first == 0 else spec.block_channels[first - 1]
    in_rows = (4 if planes else 1) * _rup8(cin)
    out_rows = _rup8(spec.block_channels[last])  # A/B end flat (s2); C/D flat
    acc = skip = 0
    c = cin
    for i in range(first, last + 1):
        if planes and i not in spec.downsample_blocks:
            acc = max(acc, 4 * _rup8(c))
            skip = max(skip, 4 * _rup8(spec.block_channels[i]))
        c = spec.block_channels[i]
    return in_rows, out_rows, acc, skip


def _make_segment_kernel(spec: BlazeFace, seg: str):
    first, last, in_h, planes, t = SEGMENTS[seg]
    downsample = set(spec.downsample_blocks)
    h = in_h // 2 if planes else in_h
    _, lq, lqp, _, _ = _geom(h)

    lay = _seg_layout(spec, seg)

    def kernel(x_ref, f32_ref, whi_ref, wlo_ref, out_ref, *scratch):
        acc_scr, skip_scr = scratch if planes else (None, None)
        buf = x_ref[0]
        for j, i in enumerate(range(first, last + 1)):
            geo = lay[j]
            ci8, m, k, koff = geo["ci8"], geo["m"], geo["k"], geo["koff"]
            w = {"dwk": f32_ref[:ci8, 11 * j:11 * j + 9],
                 "dwb": f32_ref[:ci8, 11 * j + 9:11 * j + 10],
                 "pwb": f32_ref[:m, 11 * j + 10:11 * j + 11],
                 "w_hi": whi_ref[:m, koff:koff + k],
                 "w_lo": wlo_ref[:m, koff:koff + k]}
            grow = _rup8(spec.block_channels[i]) - ci8
            if i in downsample:
                buf = _block_s2_planes(buf, w, h, t, ci8, grow)
            elif planes:
                buf = _block_s1_planes(buf, w, h, t, ci8, grow,
                                       acc_scr, skip_scr)
            else:
                buf = _block_s1_flat(buf, w, h, t, grow)
        out_ref[0] = buf

    return kernel


def run_segment(spec: BlazeFace, seg_weights, x, *, seg: str,
                interpret: bool = False):
    """Run one fused segment on COALESCED input: x (G, R, T*LqP) holds T
    lane-coalesced images per grid row (plane-2 rows for A/B, flat for C/D).
    Returns the coalesced output (G, Co8, T*LqP_out) — segment B's output
    feeds segment C directly with no bridge.  Jit the caller; seg_weights
    carries static mode metadata alongside the arrays."""
    first, last, in_h, planes, t = SEGMENTS[seg]
    g = x.shape[0]
    args = [seg_weights["f32"], seg_weights["w_hi"], seg_weights["w_lo"]]
    h = in_h // 2 if planes else in_h
    _, _, lqp, _, _ = _geom(h)
    in_rows, out_rows, acc_rows, skip_rows = _seg_row_sizes(spec, seg)
    assert x.shape[1] == in_rows and x.shape[2] == t * lqp, \
        f"{seg}: want (·, {in_rows}, {t * lqp}), got {x.shape}"
    olt = _outlen_t(h, t)

    in_specs = [pl.BlockSpec((1, in_rows, t * lqp), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(a.shape, lambda i, nd=a.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for a in args]
    scratch_shapes = []
    if planes:
        scratch_shapes += [pltpu.VMEM((acc_rows, olt), jnp.float32),
                           pltpu.VMEM((skip_rows, olt), jnp.float32)]
    return pl.pallas_call(
        _make_segment_kernel(spec, seg),
        grid=(g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, out_rows, t * lqp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, out_rows, t * lqp), jnp.float32),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *args)


# --------------------------------------------------------- XLA orchestration
def _gap_nchw(y: jax.Array, c8: int) -> jax.Array:
    """(B, C, H, W) -> (B, C8, (H+2)^2) zero-bordered flat, channel-major
    throughout (pad + reshape only — no transposes)."""
    b, c, h, w = y.shape
    y = jnp.pad(y, ((0, 0), (0, c8 - c), (1, 1), (1, 1)))
    return y.reshape(b, c8, (h + 2) * (w + 2))


def _planes_nchw(y: jax.Array, c8: int) -> jax.Array:
    """(B, C, H, W) -> (B, 4*C8, Lq@H/2): the 4 parity planes, each gapped,
    stacked along channels (strided slices + pads, no transposes)."""
    planes = [_gap_nchw(y[:, :, p::2, q::2], c8)
              for p in (0, 1) for q in (0, 1)]
    return jnp.concatenate(planes, axis=1)


def _unflatten_nchw(buf: jax.Array, h: int, c: int) -> jax.Array:
    """(B, C8, (h+2)^2) -> (B, C, h, h) interior, channel-major."""
    b = buf.shape[0]
    return buf.reshape(b, buf.shape[1], h + 2, h + 2)[:, :c, 1:h + 1, 1:h + 1]


def _coalesce(x: jax.Array, t: int, lqp: int) -> jax.Array:
    """(B, rows, Lq) -> (B//t, rows, t*LqP): t images lane-coalesced at
    stride LqP (zero padding between spans)."""
    b, rows, lq = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, lqp - lq)))
    return x.reshape(b // t, t, rows, lqp).transpose(0, 2, 1, 3) \
            .reshape(b // t, rows, t * lqp)


def _uncoalesce(y: jax.Array, t: int, lq: int) -> jax.Array:
    """Inverse of _coalesce: (G, rows, t*LqP) -> (G*t, rows, Lq)."""
    g, rows, tl = y.shape
    lqp = tl // t
    y = y.reshape(g, rows, t, lqp).transpose(0, 2, 1, 3)
    return y.reshape(g * t, rows, lqp)[:, :, :lq]


def apply_fused(spec: BlazeFace, backbone_params, packed, x, *,
                interpret: bool = False):
    """Fused-backbone forward: x (B, 128, 128, 3) in [-1, 1] -> (feat88
    (B,16,16,88), feat96 (B,8,8,96)) NHWC.  B must be divisible by 8 (the
    segment coalescing factor).  Stem and block 11 run in XLA at HIGHEST
    precision; everything else in the four Pallas segments."""
    bp = backbone_params
    c2 = spec.block_channels[2]
    t = SEGMENTS["A"][4]
    with jax.default_matmul_precision("highest"):
        y0 = jax.lax.conv_general_dilated(
            x, bp["stem"]["kernel"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))
        y0 = jax.nn.relu(y0 + bp["stem"]["bias"][None, :, None, None])
    a_in = _coalesce(_planes_nchw(y0, _rup8(y0.shape[1])), t, _geom(32)[2])
    a_out = run_segment(spec, packed["A"], a_in, seg="A",
                        interpret=interpret)            # (B/t, 32, t*LqP@32)
    y32 = _unflatten_nchw(_uncoalesce(a_out, t, _geom(32)[1]), 32, c2)
    b_in = _coalesce(_planes_nchw(y32, _rup8(c2)), t, _geom(16)[2])
    b_out = run_segment(spec, packed["B"], b_in, seg="B",
                        interpret=interpret)            # (B/t, 48, t*LqP@16)
    c_out = run_segment(spec, packed["C"], b_out, seg="C",
                        interpret=interpret)            # (B/t, 88, t*LqP@16)
    c88 = spec.block_channels[spec.tap88_block]
    feat88 = _unflatten_nchw(_uncoalesce(c_out, t, _geom(16)[1]), 16, c88
                             ).transpose(0, 2, 3, 1)
    # block 11 (s2, 88->96) in XLA: feat88 leaves for the SSD heads anyway
    blk = bp["blocks"][11]
    with jax.default_matmul_precision("highest"):
        tt = jax.lax.conv_general_dilated(
            feat88, blk["dw_kernel"], (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c88) + blk["dw_bias"]
        tt = jax.lax.conv_general_dilated(
            tt, blk["pw_kernel"], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NCHW"))
        tt = tt + blk["pw_bias"][None, :, None, None]
        skip = jax.lax.reduce_window(feat88, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "SAME")
        skip = skip.transpose(0, 3, 1, 2)
        cgrow = spec.block_channels[11] - c88
        if cgrow:
            skip = jnp.pad(skip, ((0, 0), (0, cgrow), (0, 0), (0, 0)))
        y11 = jax.nn.relu(tt + skip)                        # (B, 96, 8, 8)
    d_in = _coalesce(_gap_nchw(y11, _rup8(96)), t, _geom(8)[2])
    d_out = run_segment(spec, packed["D"], d_in, seg="D",
                        interpret=interpret)            # (B/t, 96, t*LqP@8)
    feat96 = _unflatten_nchw(_uncoalesce(d_out, t, _geom(8)[1]), 8,
                             spec.block_channels[-1]).transpose(0, 2, 3, 1)
    return feat88, feat96
