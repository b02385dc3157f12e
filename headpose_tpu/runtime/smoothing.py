"""Temporal smoothing of detection signals.

The reference smooths pose/box/keypoint signals with per-signal EMA filters in
the webcam loop (BlazePoser/blazeFaceDetectorH5.py:16-35, 406-425) — but keeps
ONE shared filter bank for all faces in frame, cross-contaminating multi-face
streams (SURVEY.md §2.3).  Here smoothing is a pure function over an explicit
state pytree, keyed per track slot, so multi-face streams smooth correctly and
the whole thing composes with jit / lax.scan for offline sequences.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_init", "ema_update", "smooth_sequence", "TrackSmoother"]


class EmaState(NamedTuple):
    """State for exponential smoothing of an arbitrary array pytree.
    (NamedTuple so it is itself a pytree and flows through scan/jit.)"""

    value: Any          # pytree of arrays — last smoothed values
    initialized: Any    # matching pytree of bool arrays (per element)


def ema_init(example: Any) -> EmaState:
    return EmaState(
        value=jax.tree_util.tree_map(jnp.zeros_like, example),
        initialized=jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape, bool), example))


def ema_update(state: EmaState, measurement: Any, alpha: float,
               valid: Any = None) -> tuple[EmaState, Any]:
    """One smoothing step: y = α·x + (1-α)·y_prev, seeding on first valid sample.

    valid (optional): ONE bool array whose shape prefixes every measurement
    leaf (it is right-padded with singleton axes and broadcast per leaf) —
    invalid slots keep their state, so padded face slots don't pollute the
    filters.  Per-leaf validity pytrees are not supported.
    """

    def step(v_prev, init, x, ok):
        seeded = jnp.where(init, alpha * x + (1.0 - alpha) * v_prev, x)
        new_v = jnp.where(ok, seeded, v_prev)
        new_init = init | ok
        return new_v, new_init

    leaves_v, treedef = jax.tree_util.tree_flatten(state.value)
    leaves_i = treedef.flatten_up_to(state.initialized)
    leaves_x = treedef.flatten_up_to(measurement)
    if valid is None:
        leaves_ok = [jnp.ones(x.shape, bool) for x in leaves_x]
    else:
        leaves_ok = [jnp.broadcast_to(
            jnp.reshape(valid, valid.shape + (1,) * (x.ndim - valid.ndim)), x.shape)
            for x in leaves_x]

    out_v, out_i = [], []
    for v, i, x, ok in zip(leaves_v, leaves_i, leaves_x, leaves_ok):
        nv, ni = step(v, i, x, ok)
        out_v.append(nv)
        out_i.append(ni)
    new_state = EmaState(value=treedef.unflatten(out_v),
                         initialized=treedef.unflatten(out_i))
    return new_state, new_state.value


def smooth_sequence(measurements: Any, alpha: float, valid: Any = None,
                    state: EmaState | None = None,
                    return_state: bool = False) -> Any:
    """Smooth a time-major pytree (T, ...) in one lax.scan — offline sequences
    (e.g. recorded video) smooth on device without a Python loop.

    Pass the returned state back in (with return_state=True) to smooth a long
    timeline chunk by chunk with identical results to one big scan."""
    if state is None:
        example = jax.tree_util.tree_map(lambda a: a[0], measurements)
        state = ema_init(example)

    def step(state, inp):
        if valid is None:
            x, ok = inp, None
        else:
            x, ok = inp
        return ema_update(state, x, alpha, ok)

    xs = measurements if valid is None else (measurements, valid)
    final_state, smoothed = jax.lax.scan(step, state, xs)
    return (smoothed, final_state) if return_state else smoothed


class TrackSmoother:
    """Stateful convenience wrapper for live streams.

    Smooths BatchResults-shaped signals (poses, boxes, keypoints) with one
    filter bank per (image, face-slot) — the multi-face-correct version of the
    reference's single shared bank.
    """

    def __init__(self, alpha: float = 0.15):
        self.alpha = float(alpha)
        self._state: EmaState | None = None

    def reset(self) -> None:
        self._state = None

    @functools.cached_property
    def _step(self):
        # ONE jitted program per smoother (same pattern as
        # tracking.IoUTrackSmoother._step): eager ema_update dispatches each
        # of its per-leaf ops individually — through the axon TPU tunnel
        # that is one round trip per op per frame (CLAUDE.md: jit every
        # tool path)
        return jax.jit(functools.partial(ema_update, alpha=self.alpha))

    def __call__(self, signals: Any, valid=None) -> Any:
        if self._state is None:
            self._state = ema_init(signals)
        self._state, smoothed = self._step(self._state, signals, valid=valid)
        return smoothed
