"""Identity-matched multi-face smoothing: IoU track association + per-track EMA.

The reference smooths with ONE shared filter bank for every face in frame
(BlazePoser/blazeFaceDetectorH5.py:406-425), cross-contaminating multi-face
streams.  runtime.smoothing keys filters per NMS output slot — better, but a
slot is a score rank, not an identity: two faces that swap score order between
frames swap filter states.  This module adds the actual fix: detections are
greedily matched to persistent TRACKS by box IoU before the EMA update, so
filters follow faces, not ranks.

Everything is a pure function over an explicit TrackState pytree with static
shapes (fixed slot count, validity masks), so it jits, vmaps over streams, and
composes with lax.scan for offline timelines — same design rules as
runtime.smoothing.

    tracker = IoUTrackSmoother(alpha=0.15)
    smoothed = tracker(results.boxes, results.valid,
                       {"poses": results.poses, "boxes": results.boxes})
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from .smoothing import EmaState, ema_init, ema_update

__all__ = ["TrackState", "tracks_init", "associate", "tracks_update",
           "track_sequence", "IoUTrackSmoother"]

_FREE_PRIORITY = 1 << 20   # free slots always beat stealing a stale track


class TrackState(NamedTuple):
    """Persistent per-slot track state (all arrays fixed-size over T slots)."""

    boxes: jax.Array    # (T, 4) last matched box per track
    active: jax.Array   # (T,) bool — slot holds a live track
    age: jax.Array      # (T,) int32 — frames since this track last matched
    ema: EmaState       # per-slot filters over the smoothed signal pytree


def tracks_init(example_signals: Any, num_slots: int) -> TrackState:
    """Fresh state. example_signals: pytree of (F, ...) per-detection arrays —
    only shapes/dtypes are read; filters are allocated per track slot."""
    per_track = jax.tree_util.tree_map(
        lambda a: jnp.zeros((num_slots,) + a.shape[1:], a.dtype),
        example_signals)
    return TrackState(boxes=jnp.zeros((num_slots, 4), jnp.float32),
                      active=jnp.zeros((num_slots,), bool),
                      age=jnp.zeros((num_slots,), jnp.int32),
                      ema=ema_init(per_track))


def associate(track_boxes: jax.Array, track_active: jax.Array,
              track_age: jax.Array, boxes: jax.Array, valid: jax.Array,
              iou_threshold: float = 0.3):
    """Greedy IoU assignment of detections to track slots.

    Highest-IoU (detection, active track) pairs match first (each side used
    once, matches require IoU > iou_threshold); remaining valid detections
    open new tracks on free slots (or steal the stalest unmatched slot if
    none are free; with sustained track churn — more than T distinct faces
    inside a max_missed window — the stolen slot can hold a recently-missed
    track, whose filter then re-seeds on reappearance instead of resuming.
    Raise num_slots or lower max_missed if that matters).  If fresh
    detections outnumber the assignable slots, the overflow gets slot -1
    (callers pass the raw measurement through unsmoothed).

    Returns (slot (F,) int32 — track slot per detection, -1 for unassigned,
    junk for invalid detections; new_track (F,) bool — detection actually
    opened a fresh track)."""
    F, T = boxes.shape[0], track_boxes.shape[0]
    # IoU matrix detections x tracks
    x1 = jnp.maximum(boxes[:, None, 0], track_boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], track_boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], track_boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], track_boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area_d = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0.0) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 0.0)
    area_t = jnp.maximum(track_boxes[:, 2] - track_boxes[:, 0], 0.0) * \
        jnp.maximum(track_boxes[:, 3] - track_boxes[:, 1], 0.0)
    union = area_d[:, None] + area_t[None, :] - inter
    iou = jnp.where(union > 0.0, inter / union, 0.0)

    eligible = valid[:, None] & track_active[None, :]
    m = jnp.where(eligible, iou, -1.0)
    slot0 = jnp.full((F,), -1, jnp.int32)

    def body(_, carry):
        m, slot = carry
        flat = jnp.argmax(m)
        i, j = flat // T, flat % T
        ok = m[i, j] > iou_threshold
        slot = jnp.where(ok, slot.at[i].set(j.astype(jnp.int32)), slot)
        # consume row i and column j so each side matches at most once
        m = jnp.where(ok, m.at[i, :].set(-1.0).at[:, j].set(-1.0), m)
        return m, slot

    _, slot = jax.lax.fori_loop(0, min(F, T), body, (m, slot0))

    matched = slot >= 0
    taken = jnp.any((slot[:, None] == jnp.arange(T)[None, :]) &
                    matched[:, None], axis=0)                       # (T,)
    new_track = valid & ~matched
    # free slots first (low index first), then stalest unmatched tracks
    # (older age = higher priority); slots matched this frame are never taken
    priority = jnp.where(
        taken, jnp.int32(-1),
        jnp.where(~track_active,
                  _FREE_PRIORITY - jnp.arange(T, dtype=jnp.int32),
                  track_age))
    order = jnp.argsort(-priority, stable=True)                     # (T,)
    rank = jnp.cumsum(new_track.astype(jnp.int32)) - 1              # (F,)
    # more fresh detections than assignable slots (free + stealable): the
    # overflow gets NO slot (-1) rather than colliding on a clipped index —
    # a collision would sum two faces into one track measurement, and
    # clipping could also land on a slot matched this very frame
    n_avail = jnp.sum(priority >= 0)
    overflow = new_track & (rank >= n_avail)
    slot = jnp.where(new_track & ~overflow,
                     order[jnp.clip(rank, 0, T - 1)], slot)
    return slot, new_track & ~overflow


def tracks_update(state: TrackState, boxes: jax.Array, valid: jax.Array,
                  signals: Any, alpha: float, iou_threshold: float = 0.3,
                  max_missed: int = 10):
    """One tracking + smoothing step (pure; scan/jit-composable).

    boxes (F, 4) / valid (F,): this frame's detections.  signals: pytree of
    (F, ...) per-detection arrays to smooth.  Returns (new_state, smoothed
    signals in DETECTION order)."""
    T = state.boxes.shape[0]
    F = boxes.shape[0]
    slot, new_track = associate(state.boxes, state.active, state.age,
                                boxes, valid, iou_threshold)

    # detection -> track scatter as a one-hot matmul (TPU-friendly gather)
    scatter = ((slot[None, :] == jnp.arange(T)[:, None]) &
               valid[None, :]).astype(jnp.float32)                  # (T, F)

    def to_tracks(a):
        flat = a.reshape(F, -1).astype(jnp.float32)
        return (scatter @ flat).reshape((T,) + a.shape[1:])

    track_meas = jax.tree_util.tree_map(to_tracks, signals)
    got = scatter.sum(axis=1) > 0                                   # (T,)
    opened = (scatter @ new_track[:, None].astype(jnp.float32))[:, 0] > 0

    # fresh tracks must seed, not blend with the slot's previous occupant
    ema = EmaState(
        value=state.ema.value,
        initialized=jax.tree_util.tree_map(
            lambda init: init & ~jnp.reshape(
                opened, opened.shape + (1,) * (init.ndim - 1)),
            state.ema.initialized))
    ema, smoothed_tracks = ema_update(ema, track_meas, alpha, valid=got)

    # gather smoothed values back to detection order
    def to_dets(a):
        flat = a.reshape(T, -1).astype(jnp.float32)
        return (scatter.T @ flat).reshape((F,) + a.shape[1:])

    smoothed = jax.tree_util.tree_map(to_dets, smoothed_tracks)
    # valid detections that received no slot (slot overflow — more fresh
    # faces than free+stealable slots) pass through UNSMOOTHED rather than
    # as the zeros the empty scatter column would produce
    unassigned = valid & (slot < 0)

    def _fallback(s, raw):
        m = jnp.reshape(unassigned, unassigned.shape + (1,) * (s.ndim - 1))
        return jnp.where(m, raw.astype(s.dtype), s)

    smoothed = jax.tree_util.tree_map(_fallback, smoothed, signals)

    track_boxes = jnp.where(got[:, None], to_tracks(boxes), state.boxes)
    age = jnp.where(got, 0, state.age + 1)
    active = (state.active | got) & (age <= max_missed)
    return TrackState(track_boxes, active, age, ema), smoothed


def track_sequence(boxes: jax.Array, valid: jax.Array, signals: Any,
                   alpha: float, iou_threshold: float = 0.3,
                   max_missed: int = 10, num_slots: int | None = None,
                   state: TrackState | None = None,
                   return_state: bool = False) -> Any:
    """Identity-matched smoothing over a whole timeline as ONE lax.scan.

    boxes (N, F, 4) / valid (N, F) / signals pytree of (N, F, ...) in frame
    order → smoothed signals, same shapes.  The scan carries TrackState, so
    filters follow faces (IoU association) across the video — the timeline
    analogue of IoUTrackSmoother, used by runtime.offline.

    state/return_state mirror smoothing.smooth_sequence: pass the returned
    state into the next call to process a long video in chunks with results
    identical to one big scan."""
    boxes = jnp.asarray(boxes)
    valid = jnp.asarray(valid)
    if state is None:
        slots = num_slots or 2 * boxes.shape[1]
        state = tracks_init(
            jax.tree_util.tree_map(lambda a: jnp.asarray(a)[0], signals),
            slots)

    def step(st, frame):
        b, v, sig = frame
        st, smoothed = tracks_update(st, b, v, sig, alpha,
                                     iou_threshold, max_missed)
        return st, smoothed

    signals = jax.tree_util.tree_map(jnp.asarray, signals)
    state, smoothed = jax.lax.scan(step, state, (boxes, valid, signals))
    return (smoothed, state) if return_state else smoothed


class IoUTrackSmoother:
    """Stateful wrapper for live streams — the identity-matched upgrade of
    smoothing.TrackSmoother.  Call once per frame with this frame's boxes,
    validity mask, and the signal pytree to smooth."""

    def __init__(self, alpha: float = 0.15, iou_threshold: float = 0.3,
                 max_missed: int = 10, num_slots: int | None = None):
        self.alpha = float(alpha)
        self.iou_threshold = float(iou_threshold)
        self.max_missed = int(max_missed)
        self.num_slots = num_slots
        self._state: TrackState | None = None

    def reset(self) -> None:
        self._state = None

    @functools.cached_property
    def _step(self):
        # ONE jitted program per tracker: eager tracks_update would dispatch
        # its ~40 small ops per frame individually — through the axon TPU
        # tunnel that is ~40 round trips per frame (CLAUDE.md: jit every
        # tool path)
        return jax.jit(functools.partial(
            tracks_update, alpha=self.alpha,
            iou_threshold=self.iou_threshold, max_missed=self.max_missed))

    def __call__(self, boxes, valid, signals: Any) -> Any:
        boxes = jnp.asarray(boxes)
        valid = jnp.asarray(valid)
        if self._state is None:
            slots = self.num_slots or 2 * boxes.shape[0]
            self._state = tracks_init(signals, slots)
        self._state, smoothed = self._step(self._state, boxes, valid, signals)
        return smoothed
