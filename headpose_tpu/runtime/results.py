"""Detection results containers.

The reference returns ragged per-image numpy arrays in a Results object
(BlazePoser/blazeFaceDetectorH5.py:359-364).  On TPU the batched pipeline
produces fixed-size slabs with a validity mask (static shapes); this module
provides both views: the padded device-side pytree and a host-side trim to
the reference's ragged contract.
"""
from __future__ import annotations

import dataclasses

import numpy as np

try:
    import jax
except ImportError:      # a JAX-free edge/serving host (runtime.edge): both
    jax = None           # containers still work as plain numpy dataclasses

__all__ = ["Results", "BatchResults"]


@dataclasses.dataclass(eq=False)  # eq=True's tuple-compare would call
class Results:                    # bool() on elementwise ndarray ==
    """Per-image detections, ragged (N = number of faces found).

    boxes      (N, 4)  [x1, y1, x2, y2] normalized
    keypoints  (N, 6, 2) normalized
    scores     (N,)
    poses      (N, 3)  yaw/pitch/roll in degrees
    """

    boxes: np.ndarray
    keypoints: np.ndarray
    scores: np.ndarray
    poses: np.ndarray

    def __len__(self) -> int:
        return int(self.scores.shape[0])


@dataclasses.dataclass(eq=False)
class BatchResults:
    """Batched fixed-size detections (device-side, jit-friendly).

    All arrays padded to max_faces with valid (B, F) bool marking real rows.
    Registered as a JAX pytree (all five fields are data), so jax.tree.map /
    device_get / jit compose with it directly.
    """

    boxes: jax.Array      # (B, F, 4)
    keypoints: jax.Array  # (B, F, 6, 2)
    scores: jax.Array     # (B, F)
    poses: jax.Array      # (B, F, 3)
    valid: jax.Array      # (B, F)

    @property
    def counts(self) -> jax.Array:
        return self.valid.sum(axis=-1)

    @classmethod
    def from_ragged(cls, results: list, max_faces: int = 100
                    ) -> "BatchResults":
        """Inverse of trim(): ragged per-image Results -> padded slabs.

        Lets anything that produced host-side ragged results (a remote
        PoseClient, a deserialized log) re-enter the padded-pytree pipeline
        (smoothing, tracking, tree ops).  max_faces defaults to the
        reference's MAX_FACE_NUM (blazeFaceDetectorH5.py:9); images with
        more detections than max_faces keep their top rows (detections are
        score-descending by construction).
        """
        B, F = len(results), int(max_faces)
        boxes = np.zeros((B, F, 4), np.float32)
        keypoints = np.zeros((B, F, 6, 2), np.float32)
        scores = np.zeros((B, F), np.float32)
        poses = np.zeros((B, F, 3), np.float32)
        valid = np.zeros((B, F), bool)
        for b, r in enumerate(results):
            n = min(len(r), F)
            boxes[b, :n] = r.boxes[:n]
            keypoints[b, :n] = r.keypoints[:n]
            scores[b, :n] = r.scores[:n]
            poses[b, :n] = r.poses[:n]
            valid[b, :n] = True
        return cls(boxes=boxes, keypoints=keypoints, scores=scores,
                   poses=poses, valid=valid)

    def trim(self) -> list[Results]:
        """Host-side conversion to the reference's ragged per-image contract."""
        # ONE combined D2H transfer: five separate np.asarray fetches would
        # each pay a synchronous tunnel round trip (CLAUDE.md, ~30 ms each)
        arrs = (self.boxes, self.keypoints, self.scores,
                self.poses, self.valid)
        if jax is not None:
            arrs = jax.device_get(arrs)
        boxes, keypoints, scores, poses, valid = (np.asarray(a) for a in arrs)
        out = []
        for b in range(valid.shape[0]):
            m = valid[b]
            out.append(Results(boxes=boxes[b][m], keypoints=keypoints[b][m],
                               scores=scores[b][m], poses=poses[b][m]))
        return out


if jax is not None:
    jax.tree_util.register_dataclass(
        BatchResults,
        data_fields=["boxes", "keypoints", "scores", "poses", "valid"],
        meta_fields=[])
