"""Offline video processing: batched detection over whole files.

The reference can only process video frame-by-frame through its batch-1 model
(webcam loop, blazeFaceDetectorH5.py:366-449).  This pipeline reads a video,
runs detection in large device batches, applies identity-matched EMA
smoothing as a lax.scan over the whole timeline (runtime.tracking.
track_sequence — filters follow faces via IoU association, not NMS score
ranks; pass tracking=False for the reference-like per-slot filters), and
optionally writes the annotated video — the high-throughput path for
processing recorded footage.

    python -m headpose_tpu.runtime.offline in.mp4 --model unified.h5 --out annotated.mp4
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

from .detector import FaceDetector
from .smoothing import smooth_sequence
from .tracking import track_sequence

__all__ = ["process_video", "process_frames"]


@dataclasses.dataclass
class VideoResults:
    """Per-frame detection slabs for a whole clip (T frames)."""

    boxes: np.ndarray      # (T, F, 4)
    keypoints: np.ndarray  # (T, F, 6, 2)
    scores: np.ndarray     # (T, F)
    poses: np.ndarray      # (T, F, 3)
    valid: np.ndarray      # (T, F)


def _smooth_timeline(res: "VideoResults", alpha: float, tracking: bool,
                     state=None, return_state: bool = False):
    """One smoothing dispatch shared by process_frames and process_video's
    chunked loop: identity-matched (track_sequence) or slot-keyed
    (smooth_sequence), with optional state carry across chunks."""
    signals = {"poses": res.poses, "boxes": res.boxes,
               "keypoints": res.keypoints}
    if tracking:
        return track_sequence(res.boxes, res.valid, signals, alpha,
                              state=state, return_state=return_state)
    return smooth_sequence(signals, alpha, valid=res.valid,
                           state=state, return_state=return_state)


def process_frames(detector: FaceDetector, frames: np.ndarray,
                   batch_size: int = 64, smooth_alpha: float | None = 0.15,
                   tracking: bool = True) -> VideoResults:
    """frames (T, H, W, 3) BGR → VideoResults, detection batched on device,
    smoothing as one scan over the timeline (identity-matched IoU tracking
    by default; tracking=False keys filters by NMS slot instead)."""
    chunks = []
    for start in range(0, len(frames), batch_size):
        chunk = frames[start:start + batch_size]
        pad = batch_size - len(chunk)
        if pad:  # keep one compiled shape
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
        batch = detector.detect(chunk)
        chunks.append((batch, batch_size - pad))

    def cat(field):
        return np.concatenate([np.asarray(getattr(b, field))[:n]
                               for b, n in chunks])

    out = VideoResults(boxes=cat("boxes"), keypoints=cat("keypoints"),
                       scores=cat("scores"), poses=cat("poses"),
                       valid=cat("valid"))
    if smooth_alpha is not None:
        smoothed = _smooth_timeline(out, smooth_alpha, tracking)
        out.poses = np.asarray(smoothed["poses"])
        out.boxes = np.asarray(smoothed["boxes"])
        out.keypoints = np.asarray(smoothed["keypoints"])
    return out


def process_video(detector: FaceDetector, path: str, out_path: str | None = None,
                  batch_size: int = 64, smooth_alpha: float | None = 0.15,
                  max_frames: int | None = None,
                  tracking: bool = True) -> VideoResults:
    """Read a video file chunk by chunk (bounded host memory — an hour of
    1080p would not fit RAM whole), detect per chunk, optionally write the
    annotated copy as it goes.  Detection slabs for the full timeline are
    returned; smoothing runs as one scan over them at the end.  Needs cv2."""
    import cv2

    from .results import Results
    from .viz import draw_detections

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"cannot open video {path!r}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 20.0

    writer = None
    chunks: list[VideoResults] = []
    ema_state = None
    total = 0
    try:
        while max_frames is None or total < max_frames:
            frames = []
            budget = batch_size if max_frames is None else min(
                batch_size, max_frames - total)
            while len(frames) < budget:
                ok, frame = cap.read()
                if not ok:
                    break
                frames.append(frame)
            if not frames:
                break
            chunk = np.stack(frames)
            total += len(frames)
            res = process_frames(detector, chunk, batch_size, smooth_alpha=None)
            if smooth_alpha is not None:
                # smoothing state carries across chunks — identical to one
                # big scan over the whole timeline
                smoothed, ema_state = _smooth_timeline(
                    res, smooth_alpha, tracking, state=ema_state,
                    return_state=True)
                res = VideoResults(boxes=np.asarray(smoothed["boxes"]),
                                   keypoints=np.asarray(smoothed["keypoints"]),
                                   scores=res.scores,
                                   poses=np.asarray(smoothed["poses"]),
                                   valid=res.valid)
            chunks.append(res)

            if out_path:
                if writer is None:
                    writer = cv2.VideoWriter(
                        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (chunk.shape[2], chunk.shape[1]))
                for t in range(len(frames)):
                    m = res.valid[t]
                    writer.write(draw_detections(chunk[t], Results(
                        boxes=res.boxes[t][m], keypoints=res.keypoints[t][m],
                        scores=res.scores[t][m], poses=res.poses[t][m])))
    finally:
        cap.release()
        if writer is not None:
            writer.release()
    if not chunks:
        raise RuntimeError(f"no frames in {path!r}")

    return VideoResults(**{f: np.concatenate([getattr(c, f) for c in chunks])
                           for f in ("boxes", "keypoints", "scores", "poses",
                                     "valid")})


def main(argv=None) -> None:

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("video")
    p.add_argument("--model", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--no_smooth", action="store_true")
    p.add_argument("--no_tracking", action="store_true",
                   help="key filters by NMS slot instead of IoU identity")
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--head_eval", default="auto",
                   choices=["auto", "map", "survivors"],
                   help="pose heads over every map cell ('map', the "
                        "reference semantics) or on the detected faces' "
                        "feature vectors ('survivors'); 'auto' picks "
                        "survivors exactly when a head declares spatial "
                        "context (e.g. unified-best)")
    args = p.parse_args(argv)
    from ..pretrained import resolve_model_path

    model = resolve_model_path(args.model)
    if model is None:
        from ..pretrained import flagship_detector

        det = flagship_detector(head_eval=args.head_eval)
    elif os.path.isdir(model):
        det = FaceDetector.from_native(model, head_eval=args.head_eval)
    else:
        det = FaceDetector.from_h5(model, head_eval=args.head_eval)
    res = process_video(det, args.video, args.out, args.batch_size,
                        None if args.no_smooth else 0.15, args.max_frames,
                        tracking=not args.no_tracking)
    counts = res.valid.sum(axis=1)
    print(f"{len(counts)} frames, faces/frame min {counts.min()} "
          f"max {counts.max()} mean {counts.mean():.2f}")


if __name__ == "__main__":
    main()
