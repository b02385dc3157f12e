"""Join CLI: compose a detector with two trained pose heads → unified model.

The workflow of JoinModels.py (:111-135) as a command:

    python -m headpose_tpu.tools.join_cli \
        --detector UnifiedModels/reg1-....h5 \
        --reg1 Trained-Models-88/stoqa9pt.h5 \
        --reg2 Trained-Models-96-ReshapedInput-NoFlatten/hrchr82r.h5 \
        --out UnifiedNative/

Heads may be reference H5s or native model dirs (tools.export format).  The
output directory is named reg1-{id1}-reg2-{id2} like the reference's naming
scheme, and a smoke forward verifies the 6-output contract before saving.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..models.blazeface import blazeface_from_h5
from ..models.heads import head_from_h5
from ..models.unified import join_models
from .export import load_model, save_model

__all__ = ["extract_id_from_path", "join_and_save"]


def extract_id_from_path(path: str) -> str:
    """Model id from '.../<id>.h5' or a native model dir '.../<id>/'."""
    base = os.path.basename(os.path.normpath(path))
    return base[:-3] if base.endswith(".h5") else base


def _load_head(path: str):
    if os.path.isdir(path):
        return load_model(path)
    return head_from_h5(path)


def join_and_save(detector_path: str, reg1_path: str, reg2_path: str,
                  out_dir: str, metadata: dict | None = None) -> str:
    for p in (detector_path, reg1_path, reg2_path):
        if not os.path.exists(p):
            raise FileNotFoundError(f"model not found: {p}")

    backbone_spec, backbone_params = blazeface_from_h5(detector_path)
    h88, p88 = _load_head(reg1_path)
    h96, p96 = _load_head(reg2_path)
    model, params = join_models(backbone_spec, backbone_params,
                                h88, p88, h96, p96)

    # smoke-verify the 6-output contract (JoinModels.py:152-158); jitted —
    # eager per-op dispatch is pathological through remote-device tunnels
    import jax

    outs = jax.jit(model.reference_outputs)(
        params, np.zeros((1, 128, 128, 3), np.float32))
    shapes = [tuple(np.asarray(o).shape) for o in outs]
    expected = [(1, 512, 1), (1, 384, 1), (1, 512, 16), (1, 384, 16),
                (1, 16, 16, 3), (1, 8, 8, 3)]
    if shapes != expected:
        raise RuntimeError(f"unified contract violated: {shapes}")

    name = f"reg1-{extract_id_from_path(reg1_path)}-reg2-{extract_id_from_path(reg2_path)}"
    out_path = os.path.join(out_dir, name)
    save_model(out_path, model, params, metadata={
        "detector": os.path.abspath(detector_path),
        "reg1": os.path.abspath(reg1_path),
        "reg2": os.path.abspath(reg2_path),
        **(metadata or {})})
    return out_path


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--detector", required=True,
                   help="H5 with the BlazeFace backbone (any unified H5 works)")
    p.add_argument("--reg1", required=True, help="88-feature head (H5 or native dir)")
    p.add_argument("--reg2", required=True, help="96-feature head (H5 or native dir)")
    p.add_argument("--out", required=True, help="output directory")
    args = p.parse_args(argv)
    out = join_and_save(args.detector, args.reg1, args.reg2, args.out)
    print(f"unified model saved to {out}")


if __name__ == "__main__":
    main()
