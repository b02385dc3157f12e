"""Speed-of-light accounting for the serving forward pass.

Computes the exact MXU FLOPs of the flagship pipeline's forward in 'fast'
serving mode (dense-composed 3x3 convs — models/blazeface.py apply(dense=
True)) directly from the BlazeFace spec, and relates them to the measured
wall times (docs/BENCH.md) and to the chip's own demonstrated GEMM rates
(scripts/probe_mosaic_matmul.py → docs/mosaic_matmul_probe.json).

The point: whether XLA's conv emitter leaves anything on the table for a
custom kernel.  Writes docs/sol_accounting.json and prints the table.

Usage: python scripts/flops_accounting.py   (pure host arithmetic, no TPU)
"""
from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "sol_accounting.json")

BATCH = 128
# measured sustained ms/dispatch at batch 128 (docs/BENCH.md, fused Pallas
# postprocess; postprocess share ~0.2 ms measured as the XLA/pallas e2e
# delta + kernel-side probes)
MEASURED_MS = {"fast (3-pass HIGH)": 1.274, "max (1-pass bf16)": 0.731}
POSTPROCESS_MS = 0.20


def conv_flops(cells: int, taps: int, cin: int, cout: int) -> int:
    """MACs*2 of one dense conv over `cells` output positions."""
    return 2 * cells * taps * cin * cout


def main() -> None:
    from headpose_tpu.models.blazeface import BLAZEFACE_FRONT as spec

    per_frame = {}
    size = spec.input_size // 2           # stem is stride 2
    per_frame["stem 5x5/2"] = conv_flops(size * size, 25, 3,
                                         spec.stem_features)
    cin = spec.stem_features
    for i, cout in enumerate(spec.block_channels):
        if i in spec.downsample_blocks:
            size //= 2
        per_frame[f"block{i} dense3x3 {cin}->{cout} @{size}"] = conv_flops(
            size * size, 9, cin, cout)
        cin = cout

    c88 = spec.block_channels[spec.tap88_block]
    c96 = spec.block_channels[-1]
    g88 = spec.input_size // 8            # 16x16 for 128 input
    g96 = spec.input_size // 16
    per_frame["ssd heads 1x1"] = (
        conv_flops(g88 * g88, 1, c88, sum((spec.cls_channels[0],
                                           spec.loc_channels[0])))
        + conv_flops(g96 * g96, 1, c96, sum((spec.cls_channels[1],
                                             spec.loc_channels[1]))))
    # flagship pose heads (load_pretrained metadata: stoqa9pt = 88->64
    # softsign ->3 on the 16x16 map; hrchr82r = 96->32->16 tanh ->3 on 8x8 —
    # per-cell 1x1 conv chains)
    per_frame["pose heads 1x1"] = (
        conv_flops(g88 * g88, 1, 88, 64) + conv_flops(g88 * g88, 1, 64, 3)
        + conv_flops(g96 * g96, 1, 96, 32)
        + conv_flops(g96 * g96, 1, 32, 16) + conv_flops(g96 * g96, 1, 16, 3))
    per_frame["decode GEMM (896,16)@(16,16)"] = 2 * 896 * 16 * 16

    total_1pass = sum(per_frame.values())
    rows = []
    for mode, ms in MEASURED_MS.items():
        passes = 3 if "3-pass" in mode else 1
        fwd_ms = ms - POSTPROCESS_MS
        flops = total_1pass * passes * BATCH
        rows.append({"mode": mode, "e2e_ms": ms, "forward_ms": round(fwd_ms, 3),
                     "gflops_per_dispatch": round(flops / 1e9, 1),
                     "effective_tflops": round(flops / (fwd_ms * 1e-3) / 1e12,
                                               1)})

    doc = {"batch": BATCH,
           "per_frame_flops": {k: v for k, v in per_frame.items()},
           "total_1pass_mflops_per_frame": round(total_1pass / 1e6, 1),
           "modes": rows,
           "chip_gemm_rates_tflops":
               {"2048^3": 18.0, "4096^3": 60.0, "8192^3": 106.2,
                "source": "docs/mosaic_matmul_probe.json (XLA dot)"},
           "note": "forward_ms = measured e2e minus ~0.2 ms postprocess; "
                   "3-pass counts each bf16 pass as MXU work"}
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)

    print(f"per-frame dense-mode MXU work: {total_1pass / 1e6:.1f} MFLOP")
    for r in rows:
        print(f"{r['mode']}: {r['gflops_per_dispatch']} GFLOP / "
              f"{r['forward_ms']} ms forward = "
              f"{r['effective_tflops']} TF/s effective")
    print("chip GEMM rates (XLA dot): 18 / 60 / 106 TF/s at 2048/4096/8192")
    print("wrote", OUT)


if __name__ == "__main__":
    main()
