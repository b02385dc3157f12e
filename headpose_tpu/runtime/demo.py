"""Live demo: camera/video → detect → smooth → draw → display/record.

Capability parity with the reference webcam __main__
(BlazePoser/blazeFaceDetectorH5.py:366-449): center-square crop, per-frame
detection, EMA smoothing (alpha 0.15 — here per face slot, not one shared
bank), axis/box/keypoint overlay, optional MP4 recording, 'q' to quit.
Also supports --video for offline files and --frames N headless runs.

    python -m headpose_tpu.runtime.demo --model path/to/unified.h5
"""
from __future__ import annotations

import argparse
import contextlib
import os
import time

import numpy as np

from .viz import draw_detections
from .results import Results
from ..pretrained import resolve_model_path
from ..utils.profiling import FpsCounter

try:                     # the --server/--tflite paths detect without JAX;
    import jax           # smoothing/tracking math still wants it (any CPU
except ImportError:      # install) — see run_demo's use_ema handling
    jax = None

__all__ = ["run_demo"]


def jax_tree_first(signals):
    """Drop the leading batch-of-1 axis from every leaf (demo is single-stream)."""
    return {k: v[0] for k, v in signals.items()}


def _host_compute():
    """Context pinning eager jnp math to the host CPU backend.

    The live loop's per-frame smoothing/tracking is a handful of tiny ops on
    ≤100 rows — run eagerly on an accelerator backend each op pays a
    dispatch round trip (through a remote-TPU tunnel that is catastrophic:
    minutes per frame, measured), so the demo fetches detections once and
    smooths host-side.  Batched pipelines (offline/streaming) compose the
    same smoothers inside jit instead — that is where the device path pays.
    """
    import jax

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # no CPU backend registered — leave the default
        return contextlib.nullcontext()


def _center_square(frame: np.ndarray) -> np.ndarray:
    h, w = frame.shape[:2]
    side = min(h, w)
    y, x = (h - side) // 2, (w - side) // 2
    return frame[y:y + side, x:x + side]


class _RemoteDetector:
    """detector-shaped adapter over a PoseClient: the demo loop runs
    unchanged while inference happens on a remote PoseServer (a laptop
    webcam loop pointed at a TPU host).  Ragged wire results re-enter the
    padded pipeline via BatchResults.from_ragged, so smoothing/tracking
    compose exactly as with a local FaceDetector."""

    def __init__(self, url: str):
        from .client import PoseClient

        self.client = PoseClient(url)

    def detect(self, frame):
        from .results import BatchResults

        return BatchResults.from_ragged([self.client.detect(frame)])

    def close(self) -> None:
        self.client.close()


class _EdgeAdapter:
    """detector-shaped adapter over EdgeDetector.  Camera-resolution frames
    pass straight through: EdgeDetector owns the resize with the TF-exact
    bicubic kernel (ops/bicubic.py — the same interpolation matrices as the
    JAX path, certified from camera-sized frames in
    docs/tflite_certification.json).  Results are normalized coordinates,
    so overlays draw on the full-resolution frame unchanged."""

    def __init__(self, tflite_path: str):
        from .edge import EdgeDetector

        self.detector = EdgeDetector(tflite_path)

    def detect(self, frame):
        return self.detector.detect(frame)


def run_demo(model_path: str | None = None, source: int | str = 0,
             record: bool = False, use_ema: bool = True, alpha: float = 0.15,
             max_frames: int | None = None, display: bool = True,
             precision: str = "highest", tracking: bool = True,
             head_eval: str = "auto", server: str | None = None,
             tflite: str | None = None) -> int:
    """Run the live loop.  Returns the number of frames processed.
    model_path: H5 file, native model dir, a pretrained registry name
    (e.g. 'unified-best' — see pretrained.load_pretrained), or None for the
    shipped flagship.
    precision: serving mode (highest/fast/turbo/max — see FaceDetector).
    tracking: match detections to persistent tracks by IoU before smoothing
    (filters follow faces across score-rank swaps; runtime.tracking); False
    falls back to slot-keyed smoothing.
    head_eval: 'auto' (default — survivors exactly when a head declares
    spatial context, e.g. 'unified-best'), 'map' (grafted-graph semantics),
    or 'survivors' (heads on the detected faces' gathered feature vectors;
    see FaceDetector).
    server: a PoseServer URL — inference runs remotely; the model and
    serving config live server-side, so model_path/precision/head_eval must
    stay at their defaults here.
    tflite: a tools.tflite unified artifact — the loop runs the edge
    pipeline (TFLite interpreter + native C++ postprocess, no JAX);
    model/precision/head_eval are baked at export and must stay default."""
    import cv2

    if server is not None or tflite is not None:
        if (model_path is not None or precision != "highest"
                or head_eval != "auto"):
            where = ("on the server" if server is not None
                     else "baked into the artifact at export")
            raise ValueError(
                "the model and serving config live " + where + " — drop "
                "--model/--precision/--head_eval (configure them there)")
        if server is not None and tflite is not None:
            raise ValueError("--server and --tflite are exclusive: pick "
                             "remote inference or the local edge pipeline")
        detector = (_RemoteDetector(server) if server is not None
                    else _EdgeAdapter(tflite))
    else:
        if jax is None:
            raise RuntimeError(
                "the local detector path needs jax (any CPU install works); "
                "on a jax-free host run against a remote server (--server "
                "HOST:PORT) or an exported edge artifact (--tflite DIR)")
        from .detector import FaceDetector

        model_path = resolve_model_path(model_path)
        kw = dict(precision=precision, head_eval=head_eval)
        if model_path is None:
            from ..pretrained import flagship_detector

            detector = flagship_detector(**kw)
        elif os.path.isdir(model_path):
            detector = FaceDetector.from_native(model_path, **kw)
        else:
            detector = FaceDetector.from_h5(model_path, **kw)
    if use_ema:
        if jax is None:
            raise RuntimeError(
                "EMA smoothing/tracking math runs on JAX (any CPU install "
                "works) and no jax is importable on this host — pass "
                "use_ema=False / --no_ema to run the raw detection loop "
                "(the --tflite/--server detection path itself is JAX-free)")
        from .smoothing import TrackSmoother
        from .tracking import IoUTrackSmoother

        smoother = (IoUTrackSmoother(alpha) if tracking
                    else TrackSmoother(alpha))
    fps = FpsCounter()

    cap = cv2.VideoCapture(source)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open capture source {source!r}")

    writer = None
    frames = 0
    try:
        while max_frames is None or frames < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            frame = _center_square(frame)

            batch = detector.detect(frame)
            # one combined D2H fetch; smoothing/tracking/drawing are
            # host-side from here (see _host_compute).  The edge/server
            # paths return host numpy already (and may run without jax).
            if jax is not None:
                batch = jax.device_get(batch)
            if use_ema:
                signals = {"poses": batch.poses, "boxes": batch.boxes,
                           "keypoints": batch.keypoints}
                with _host_compute():
                    if tracking:
                        smoothed = smoother(batch.boxes[0], batch.valid[0],
                                            jax_tree_first(signals))
                        smoothed = {k: v[None] for k, v in smoothed.items()}
                    else:
                        smoothed = smoother(signals, valid=batch.valid)
                batch = type(batch)(boxes=smoothed["boxes"],
                                    keypoints=smoothed["keypoints"],
                                    scores=batch.scores,
                                    poses=smoothed["poses"],
                                    valid=batch.valid)
            results: Results = batch.trim()[0]

            out = draw_detections(frame, results, fps=fps.tick())
            if record:
                if writer is None:
                    stamp = time.strftime("%Y%m%d-%H%M%S")
                    writer = cv2.VideoWriter(
                        f"{stamp}.mp4", cv2.VideoWriter_fourcc(*"mp4v"),
                        20.0, (out.shape[1], out.shape[0]))
                writer.write(out)
            if display:
                cv2.imshow("headpose_tpu", out)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            frames += 1
    finally:
        cap.release()
        if writer is not None:
            writer.release()
        if display:
            cv2.destroyAllWindows()
        if server is not None:
            detector.close()  # reclaim the PoseClient's kept-alive socket
    return frames


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default=None, help="H5, native model dir, or pretrained name (e.g. unified-best); default: shipped flagship")
    p.add_argument("--server", default=None,
                   help="PoseServer URL (e.g. http://tpu-host:8000) — run "
                        "inference remotely; excludes --model/--precision/"
                        "--head_eval (they live server-side)")
    p.add_argument("--tflite", default=None,
                   help="unified .tflite artifact (tools.tflite) — run the "
                        "edge pipeline (TFLite + C++ postprocess, no JAX); "
                        "excludes --server/--model/--precision/--head_eval")
    p.add_argument("--camera", type=int, default=0)
    p.add_argument("--video", default=None, help="video file instead of camera")
    p.add_argument("--record", action="store_true")
    p.add_argument("--no_ema", action="store_true")
    p.add_argument("--no_tracking", action="store_true",
                   help="slot-keyed smoothing instead of IoU track association")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--headless", action="store_true")
    p.add_argument("--precision", default="highest",
                   choices=["highest", "high", "fast", "turbo", "max"],
                   help="serving mode (docs/BENCH.md)")
    p.add_argument("--head_eval", default="auto",
                   choices=["auto", "map", "survivors"],
                   help="pose heads over every map cell ('map', the "
                        "reference semantics) or on the detected faces' "
                        "feature vectors ('survivors'); 'auto' picks "
                        "survivors exactly when a head declares spatial "
                        "context (e.g. unified-best)")
    args = p.parse_args(argv)
    n = run_demo(model_path=args.model,
                 source=args.video if args.video else args.camera,
                 record=args.record, use_ema=not args.no_ema,
                 max_frames=args.frames, display=not args.headless,
                 precision=args.precision, tracking=not args.no_tracking,
                 head_eval=args.head_eval, server=args.server,
                 tflite=args.tflite)
    print(f"processed {n} frames")


if __name__ == "__main__":
    main()
