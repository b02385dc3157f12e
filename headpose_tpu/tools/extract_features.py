"""Feature-map dataset extraction: images → per-face feature vectors.

The reference's training datasets (features (N, 88|96) + poses (N, 3)) were
produced by a SIBLING repo that is not included
(Get-BlazeFace-FeatureMaps-Dataset, referenced at JoinModels.py:114;
SURVEY.md §2.15) — the reference repo itself cannot create new datasets.
This tool closes that loop: run the detector over images, take the backbone
feature vector at each detected face's grid cell (the same cell the pose-map
lookup uses, blazeFaceDetectorH5.py:342-353), and emit the standard npz
schema ready for headpose_tpu.train.

    extract_dataset(images, poses, out="BIWI_custom.npz")  # arrays in, npz out

Extraction is a single jitted program per batch: preprocess → backbone →
best-face selection → cell gather for both the 16x16x88 and 8x8x96 maps.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.anchors import FRONT_CONFIG, generate_anchors
from ..ops.detection import (anchor_cells, decode_boxes, nms_static,
                             score_threshold_to_logit)
from ..ops.image import preprocess

__all__ = ["FeatureExtractor", "extract_dataset"]


@dataclasses.dataclass
class ExtractionResult:
    features88: np.ndarray  # (N, 88) feature vector at the face cell (16x16 map)
    features96: np.ndarray  # (N, 96) feature vector at the face cell (8x8 map)
    scores: np.ndarray      # (N,) detection confidence
    found: np.ndarray       # (N,) bool — face detected in this image


class FeatureExtractor:
    """Extract per-face backbone feature vectors from images."""

    def __init__(self, model=None, params=None,
                 score_threshold: float = 0.4, iou_threshold: float = 0.3,
                 channel_order: str = "bgr", precision: str = "highest"):
        if model is None:
            from ..pretrained import load_flagship

            model, params = load_flagship()
        self.model = model
        self.params = params
        self.score_threshold = float(score_threshold)
        self.iou_threshold = float(iou_threshold)
        self.channel_order = channel_order
        self.precision = precision
        self.anchors = jnp.asarray(generate_anchors(FRONT_CONFIG), jnp.float32)

    @functools.cached_property
    def _extract(self):
        # per-INSTANCE jit with the serving config as STATIC args (same
        # pattern and rationale as runtime.detector.FaceDetector._pipeline):
        # a static-self class decoration would (a) silently reuse the old
        # trace after threshold/precision mutation (self's id doesn't
        # change) and (b) pin every extractor in the process-global cache
        return jax.jit(self._extract_impl, static_argnums=(2, 3, 4, 5))

    def _extract_impl(self, params, images, score_threshold, iou_threshold,
                      channel_order, precision):
        with jax.default_matmul_precision(precision):
            x = preprocess(images, 128, channel_order)
            out = self.model.apply(params, x)

        def per_image(scores_logits, loc, feat88, feat96):
            # shared conversion (endpoint-pinned — a bare math.log would
            # crash at thresholds 0/1)
            logit_thr = score_threshold_to_logit(score_threshold)
            valid = scores_logits > logit_thr
            boxes = decode_boxes(loc, self.anchors, 128)
            probs = jax.nn.sigmoid(scores_logits)
            sel_idx, keep = nms_static(boxes, probs, valid, max_out=1,
                                       iou_threshold=iou_threshold)
            best = sel_idx[0]  # highest-scoring surviving anchor
            # anchor → grid cell, the pose-lookup indexing (ops.detection.
            # anchor_cells).  Front anchors live on the 16x16 map; back
            # anchors on the 8x8 map.  The 8x8 cell under a front detection
            # is its spatial parent (//2); the 16x16 cell of a back
            # detection is the cell's origin corner.
            is_front, rf, cf, rb, cb = anchor_cells(best[None])
            is_front, rf, cf, rb, cb = (is_front[0], rf[0], cf[0],
                                        rb[0], cb[0])
            f88 = jnp.where(is_front, feat88[rf, cf], feat88[rb * 2, cb * 2])
            f96 = jnp.where(is_front, feat96[rf // 2, cf // 2], feat96[rb, cb])
            return f88, f96, probs[best], keep[0]

        return jax.vmap(per_image)(out["scores"], out["loc"],
                                   out["feat88"], out["feat96"])

    def extract(self, images) -> ExtractionResult:
        """images (B, H, W, 3) uint8/float → per-image best-face features."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        f88, f96, scores, found = self._extract(
            self.params, images, self.score_threshold, self.iou_threshold,
            self.channel_order, self.precision)
        return ExtractionResult(features88=np.asarray(f88),
                                features96=np.asarray(f96),
                                scores=np.asarray(scores),
                                found=np.asarray(found))


def extract_dataset(images, poses, out_88: str | None = None,
                    out_96: str | None = None, batch_size: int = 64,
                    extractor: FeatureExtractor | None = None):
    """Build training datasets from labeled images.

    images: (N, H, W, 3); poses: (N, 3) [yaw, pitch, roll] degrees.
    Writes the standard npz schema (features + poses) for each channel width,
    keeping only images where a face was detected.  Returns the kept masks.
    """
    if extractor is None:
        extractor = FeatureExtractor()
    parts = []
    n = len(images)
    for s in range(0, n, batch_size):
        chunk = np.asarray(images[s:s + batch_size])
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:1]).repeat(pad, 0)])
        r = extractor.extract(chunk)
        parts.append(ExtractionResult(r.features88[:batch_size - pad],
                                      r.features96[:batch_size - pad],
                                      r.scores[:batch_size - pad],
                                      r.found[:batch_size - pad]))
    f88 = np.concatenate([p.features88 for p in parts])
    f96 = np.concatenate([p.features96 for p in parts])
    found = np.concatenate([p.found for p in parts])
    poses = np.asarray(poses, np.float32)
    if out_88:
        np.savez_compressed(out_88, features=f88[found].astype(np.float32),
                            poses=poses[found])
    if out_96:
        np.savez_compressed(out_96, features=f96[found].astype(np.float32),
                            poses=poses[found])
    return found
