"""AOT serving artifacts: ship the COMPILED pipeline, not the model.

The reference deploys by shipping Python + tf-keras + an H5 graph and
rebuilding that graph on every process start
(/root/reference/BlazePoser/blazeFaceDetectorH5.py:80-107).  A TPU serving
fleet wants the opposite: trace and lower ONCE, serialize the lowered
program, and replay it on hosts that carry no model code at all.
``jax.export`` provides exactly that — ``export_detector`` captures a
FaceDetector's end-to-end jitted pipeline (preprocess → backbone → decode →
NMS → pose heads, weights embedded as program constants) as self-contained
StableHLO, one program per serving batch width, and ``load_exported`` replays
it with none of ``headpose_tpu.models``/``core``/``ops`` on the import path —
only this module and the BatchResults wrapper.

Artifact layout (a directory, like tools.export's native format):
    aot.json            — format version, serving config, batch table
    serve_b{N}.bin      — jax.export serialization for batch width N

Notes
-----
- Exported programs pin EVERYTHING static: input height/width/dtype, batch
  width, thresholds, precision mode, the resolved postprocess backend, and
  the weights.  That is the point — serving config changes are a re-export,
  not a runtime flag.
- ``ExportedDetector.detect`` serves arbitrary batch sizes over the exported
  widths (greedy chunking + zero-padding the tail chunk, then slicing the
  padding back off), so exporting ``batch_sizes=(1, 128)`` covers any load.
- Multi-chip detectors (``FaceDetector(mesh=...)``) are refused: an exported
  program bakes its device assignment; dp serving reconstructs the detector
  on the target topology instead.
"""
from __future__ import annotations

import json
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.results import BatchResults

__all__ = ["export_detector", "load_exported", "ExportedDetector"]

_FORMAT_VERSION = 1
_META_FILE = "aot.json"


def _resolve_backend(det, batch: int, platforms: Sequence[str]) -> str:
    """Pin the detector's postprocess backend for an exported program.

    Mirrors FaceDetector._pipeline_body's 'auto' rule (TPU + >=64 occupied
    lanes → the fused Pallas kernel) but resolves it at EXPORT time — the
    serialized program must not consult the serving host's backend."""
    backend = det.postprocess
    all_tpu = all(p == "tpu" for p in platforms)
    if backend == "auto":
        backend = "pallas" if all_tpu and batch >= 64 else "xla"
    if backend == "pallas":
        if not all_tpu:
            raise ValueError(
                "postprocess='pallas' exports a Mosaic custom call, which "
                f"only TPU can execute — platforms {tuple(platforms)} "
                "include a non-TPU target. Export with postprocess='xla' "
                "or platforms=('tpu',).")
        if jax.default_backend() != "tpu":
            # _pipeline_body decides interpret-mode from the TRACING
            # process's backend; lowering the kernel for TPU needs the
            # Mosaic pipeline a TPU-default process provides
            raise ValueError(
                "exporting the fused Pallas postprocess requires tracing "
                "under a TPU-default backend (jax.default_backend() == "
                f"'tpu', got {jax.default_backend()!r}). Re-run on the TPU "
                "host, or export with postprocess='xla'.")
    return backend


def export_detector(det, path: str, batch_sizes: Sequence[int] = (1, 128),
                    image_shape: tuple[int, int] | None = None,
                    platforms: Sequence[str] | None = None) -> dict:
    """Serialize ``det``'s compiled pipeline for the given batch widths.

    det: a runtime.FaceDetector (any loader).  Its full serving config —
        thresholds, precision mode, head_eval profile, turbo island — and
        its weights are baked into the programs.
    path: output directory (created).
    batch_sizes: program per width; ExportedDetector chunks arbitrary
        batches over these.
    image_shape: (H, W) of the raw frames the programs accept; defaults to
        the model's native input resolution (128 front / 256 back), which
        skips nothing — other sizes just add the bicubic resize in-program.
    platforms: jax.export lowering targets; defaults to the current backend.

    Returns the metadata dict written to aot.json.
    """
    if det.mesh is not None:
        raise ValueError(
            "cannot export a mesh-sharded detector: exported programs bake "
            "their device assignment. Export the single-device detector and "
            "rebuild FaceDetector(mesh=...) on the serving topology.")
    batch_sizes = sorted(set(int(b) for b in batch_sizes))
    if not batch_sizes or batch_sizes[0] < 1:
        raise ValueError(f"batch_sizes must be positive ints, got {batch_sizes}")
    if platforms is None:
        platforms = (jax.default_backend(),)
    platforms = tuple(str(p) for p in platforms)
    h, w = image_shape if image_shape is not None else (det.input_size,) * 2

    os.makedirs(path, exist_ok=True)
    programs = {}
    for b in batch_sizes:
        backend = _resolve_backend(det, b, platforms)

        def serve(images, _backend=backend):
            return det._pipeline_dispatch(
                det.params, images, det.score_threshold, det.iou_threshold,
                det.max_faces, det.precision, _backend, det.turbo_island,
                det.head_eval)

        spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.uint8)
        exported = jax.export.export(jax.jit(serve),
                                     platforms=list(platforms))(spec)
        fname = f"serve_b{b}.bin"
        with open(os.path.join(path, fname), "wb") as f:
            f.write(bytes(exported.serialize()))
        programs[str(b)] = {"file": fname, "postprocess": backend}

    meta = {
        "format_version": _FORMAT_VERSION,
        # deployment-artifact contract: record the producing toolchain so a
        # serving host with an incompatible jax fails LOUDLY with both
        # versions in the message instead of a raw deserializer error
        "versions": {
            "jax": jax.__version__,
            "export_calling_convention": int(
                exported.calling_convention_version),
        },
        "platforms": list(platforms),
        "image_shape": [int(h), int(w)],
        "dtype": "uint8",
        "batch_sizes": batch_sizes,
        "programs": programs,
        "max_faces": det.max_faces,
        "config": {
            "score_threshold": det.score_threshold,
            "iou_threshold": det.iou_threshold,
            "precision": det.precision,
            "head_eval": det.head_eval,
            "channel_order": det.channel_order,
            "input_size": det.input_size,
        },
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedDetector:
    """Serve a directory written by export_detector.

    detect() accepts any batch size: the batch is chunked greedily over the
    exported widths (largest first), the tail chunk zero-padded up to the
    smallest covering width, and the padding sliced back off — so results
    are identical to calling the source FaceDetector row for row."""

    def __init__(self, path: str):
        with open(os.path.join(path, _META_FILE)) as f:
            self.meta = json.load(f)
        if self.meta.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"AOT artifact {path} has format_version "
                f"{self.meta.get('format_version')}; this reader supports "
                f"{_FORMAT_VERSION}")
        ver = self.meta.get("versions", {})
        conv = ver.get("export_calling_convention")
        # getattr-guarded: a serving-host jax old enough to lack these
        # attributes is exactly the version-skew scenario this check exists
        # for — fall through to the curated deserialize error path instead
        # of raising AttributeError here
        lo = getattr(jax.export,
                     "minimum_supported_calling_convention_version", None)
        hi = getattr(jax.export,
                     "maximum_supported_calling_convention_version", None)
        if conv is not None and lo is not None and hi is not None:
            if not (lo <= int(conv) <= hi):
                raise ValueError(
                    f"AOT artifact {path} was exported by jax "
                    f"{ver.get('jax', '?')} with export calling-convention "
                    f"version {conv}, but this host's jax "
                    f"{jax.__version__} supports versions {lo}..{hi} — "
                    "re-export the artifact with tools.aot.export_detector "
                    "on a compatible jax (or match the producing version)")
        self.path = path
        self.batch_sizes = list(self.meta["batch_sizes"])
        self.platforms = tuple(self.meta["platforms"])
        h, w = self.meta["image_shape"]
        self._shape_hw = (int(h), int(w))
        self._loaded: dict[int, Any] = {}

    @property
    def frame_shape(self) -> tuple[int, int, int]:
        """The exact (H, W, 3) the exported programs accept — serving front
        ends (runtime.PoseServer) pin their accepted shape from this."""
        return self._shape_hw + (3,)

    def _program(self, batch: int):
        if batch not in self._loaded:
            fname = self.meta["programs"][str(batch)]["file"]
            with open(os.path.join(self.path, fname), "rb") as f:
                payload = bytearray(f.read())
            try:
                exported = jax.export.deserialize(payload)
            except Exception as e:
                ver = self.meta.get("versions", {})
                raise RuntimeError(
                    f"AOT program {fname} failed to deserialize on jax "
                    f"{jax.__version__} (artifact exported by jax "
                    f"{ver.get('jax', '?')}, calling-convention "
                    f"{ver.get('export_calling_convention', '?')}): {e} — "
                    "if the versions differ, re-export with "
                    "tools.aot.export_detector on this host's jax") from e
            # jit the replay wrapper: Exported.call re-traces on every
            # invocation otherwise (measured ~100x dispatch overhead on the
            # TPU tunnel, scripts/probe_aot_tpu.py)
            self._loaded[batch] = jax.jit(exported.call)
        return self._loaded[batch]

    def _chunks(self, b: int) -> list[int]:
        """Greedy cover of b rows by exported widths (largest first; the
        remainder takes the smallest width that still covers it)."""
        sizes = self.batch_sizes
        out, rest = [], b
        while rest > 0:
            if rest >= sizes[-1]:
                out.append(sizes[-1])
                rest -= sizes[-1]
            else:
                cover = next(s for s in sizes if s >= rest)
                out.append(cover)
                rest = 0
        return out

    def _empty_slabs(self) -> dict:
        """The B=0 contract: empty padded slabs with the exported max_faces
        width (FaceDetector.detect's slab shapes at batch 0)."""
        F = int(self.meta["max_faces"])
        return {"boxes": jnp.zeros((0, F, 4), jnp.float32),
                "keypoints": jnp.zeros((0, F, 6, 2), jnp.float32),
                "scores": jnp.zeros((0, F), jnp.float32),
                "poses": jnp.zeros((0, F, 3), jnp.float32),
                "valid": jnp.zeros((0, F), jnp.bool_)}

    def call(self, images) -> dict:
        """Raw padded postprocess slabs (the _pipeline_dispatch contract).

        Batch sizes that match an exported width dispatch with zero extra
        work — size your serving widths (e.g. the DynamicBatcher ladder) to
        the exported batch_sizes.  Other sizes chunk greedily: host batches
        pad in numpy (free), and only the tail chunk ever needs the
        per-leaf trim + cross-chunk concatenate, a handful of small device
        ops outside the programs (visible only through this container's
        per-op dispatch tunnel; see docs/BENCH.md methodology notes)."""
        is_host = not isinstance(images, jax.Array)
        if is_host:
            images = np.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(
                f"expected (B, H, W, 3) or (H, W, 3) frames, got shape "
                f"{images.shape}")
        b, h, w = images.shape[:3]
        if (h, w) != self._shape_hw:
            raise ValueError(
                f"exported programs accept (B, {self._shape_hw[0]}, "
                f"{self._shape_hw[1]}, 3) frames; got {images.shape}. "
                "Re-export with image_shape=... for other resolutions.")
        if images.dtype != np.uint8:
            raise ValueError(
                f"exported programs accept uint8 frames, got {images.dtype} "
                "(float inputs are a tracing-time choice; re-export from a "
                "detector traced on your dtype, or quantize to uint8).")
        if b == 0:
            return self._empty_slabs()
        xp = np if is_host else jnp
        parts, row = [], 0
        for width in self._chunks(b):
            take = min(width, b - row)
            chunk = images[row:row + take]
            if take < width:
                # greedy cover: only the TAIL chunk is ever padded
                chunk = xp.concatenate(
                    [chunk, xp.zeros((width - take, h, w, 3), xp.uint8)])
            post = self._program(width)(jnp.asarray(chunk))
            if take < width:
                post = jax.tree.map(lambda x: x[:take], post)
            parts.append(post)
            row += take
        if len(parts) == 1:
            return parts[0]
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def detect(self, images) -> BatchResults:
        """(B, H, W, 3) uint8 frames → BatchResults, identical row for row
        to the source FaceDetector.detect."""
        post = self.call(images)
        return BatchResults(boxes=post["boxes"], keypoints=post["keypoints"],
                            scores=post["scores"], poses=post["poses"],
                            valid=post["valid"])


def load_exported(path: str) -> ExportedDetector:
    return ExportedDetector(path)


def main(argv: Sequence[str] | None = None) -> None:
    """CLI: export a model's serving pipeline to an AOT artifact directory.

    python -m headpose_tpu.tools.aot --model unified-best --out aot/
        [--batch 1,128] [--platforms tpu] [--precision fast] ...
    """
    import argparse

    from ..pretrained import resolve_model_path
    from ..runtime.detector import FaceDetector

    p = argparse.ArgumentParser(description=main.__doc__)
    p.add_argument("--model", default=None,
                   help="H5 path, native model dir, or pretrained registry "
                        "name (default: the flagship unified model)")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--batch", default="1,128",
                   help="comma-separated batch widths to export")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets (default: current "
                        "backend)")
    p.add_argument("--image-size", type=int, default=None,
                   help="square raw-frame size the programs accept "
                        "(default: the model's native input resolution)")
    p.add_argument("--precision", default="highest",
                   choices=["highest", "fast", "turbo", "max"])
    p.add_argument("--score-threshold", type=float, default=0.4)
    p.add_argument("--iou-threshold", type=float, default=0.3)
    p.add_argument("--head-eval", default="auto",
                   choices=["auto", "map", "survivors"])
    p.add_argument("--postprocess", default="auto",
                   choices=["auto", "xla", "pallas"])
    args = p.parse_args(argv)

    kw = dict(precision=args.precision, head_eval=args.head_eval,
              postprocess=args.postprocess,
              score_threshold=args.score_threshold,
              iou_threshold=args.iou_threshold)
    model_path = resolve_model_path(args.model)
    if model_path is None:
        from ..pretrained import flagship_detector

        det = flagship_detector(**kw)
    elif os.path.isdir(model_path):
        det = FaceDetector.from_native(model_path, **kw)
    else:
        det = FaceDetector.from_h5(model_path, **kw)

    shape = (args.image_size,) * 2 if args.image_size else None
    platforms = (tuple(args.platforms.split(","))
                 if args.platforms else None)
    meta = export_detector(
        det, args.out,
        batch_sizes=[int(b) for b in args.batch.split(",")],
        image_shape=shape, platforms=platforms)
    sizes = {k: os.path.getsize(os.path.join(args.out, v["file"]))
             for k, v in meta["programs"].items()}
    print(json.dumps({"out": args.out, "batch_sizes": meta["batch_sizes"],
                      "platforms": meta["platforms"],
                      "program_bytes": sizes}))


if __name__ == "__main__":
    main()
