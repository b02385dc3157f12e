"""Identity-matched multi-face smoothing (runtime.tracking).

The claim under test (docs/PARITY.md row 3): filters follow FACES, not NMS
score ranks — the actual fix for the reference's shared-filter-bank bug
(BlazePoser/blazeFaceDetectorH5.py:406-425)."""
import jax
import jax.numpy as jnp
import numpy as np

from headpose_tpu.runtime.tracking import (IoUTrackSmoother, associate,
                                           tracks_init, tracks_update)

BOX_A = jnp.asarray([0.1, 0.1, 0.3, 0.3])
BOX_B = jnp.asarray([0.6, 0.6, 0.8, 0.8])


def _frame(boxes, poses, valid):
    return (jnp.stack(boxes), jnp.asarray(valid),
            {"poses": jnp.stack(poses)})


class TestAssociate:
    def test_matches_by_iou_not_order(self):
        track_boxes = jnp.stack([BOX_A, BOX_B])
        active = jnp.asarray([True, True])
        age = jnp.zeros(2, jnp.int32)
        # detections arrive in SWAPPED order: det0 is face B, det1 is face A
        slot, new = associate(track_boxes, active, age,
                              jnp.stack([BOX_B, BOX_A]),
                              jnp.asarray([True, True]))
        assert slot.tolist() == [1, 0]
        assert not bool(new.any())

    def test_unmatched_opens_free_slot(self):
        track_boxes = jnp.stack([BOX_A, jnp.zeros(4), jnp.zeros(4), jnp.zeros(4)])
        active = jnp.asarray([True, False, False, False])
        age = jnp.zeros(4, jnp.int32)
        slot, new = associate(track_boxes, active, age,
                              jnp.stack([BOX_B, BOX_A]),
                              jnp.asarray([True, True]))
        assert int(slot[1]) == 0          # face A keeps its track
        assert int(slot[0]) == 1          # face B opens the first free slot
        assert new.tolist() == [True, False]

    def test_invalid_detections_ignored(self):
        track_boxes = jnp.stack([BOX_A, jnp.zeros(4)])
        active = jnp.asarray([True, False])
        age = jnp.zeros(2, jnp.int32)
        slot, new = associate(track_boxes, active, age,
                              jnp.stack([BOX_A, BOX_A]),
                              jnp.asarray([False, True]))
        assert int(slot[1]) == 0
        assert not bool(new[0])


class TestCrossingFaces:
    """Two faces swap score rank between frames; the filters must follow the
    faces.  Slot-keyed smoothing (runtime.smoothing.TrackSmoother) fails this
    by construction — the regression the VERDICT r2 item 6 asks to pin."""

    def test_filters_follow_faces(self):
        tr = IoUTrackSmoother(alpha=0.5, num_slots=4)
        pose_a, pose_b = jnp.asarray([10.0, 0.0, 0.0]), jnp.asarray([-30.0, 0.0, 0.0])
        # frame 1: A ranks first
        boxes, valid, sig = _frame([BOX_A, BOX_B], [pose_a, pose_b], [True, True])
        out1 = tr(boxes, valid, sig)
        np.testing.assert_allclose(out1["poses"][0], pose_a)   # seeds
        np.testing.assert_allclose(out1["poses"][1], pose_b)
        # frame 2: the faces SWAP rank (B first), same poses
        boxes, valid, sig = _frame([BOX_B, BOX_A], [pose_b, pose_a], [True, True])
        out2 = tr(boxes, valid, sig)
        # identity-matched: det0 (face B) continues B's filter — unchanged
        np.testing.assert_allclose(out2["poses"][0], pose_b, atol=1e-6)
        np.testing.assert_allclose(out2["poses"][1], pose_a, atol=1e-6)
        # frame 3: B's pose moves; only B's filter blends
        pose_b2 = jnp.asarray([-10.0, 0.0, 0.0])
        boxes, valid, sig = _frame([BOX_B, BOX_A], [pose_b2, pose_a], [True, True])
        out3 = tr(boxes, valid, sig)
        np.testing.assert_allclose(out3["poses"][0],
                                   0.5 * pose_b2 + 0.5 * pose_b, atol=1e-6)
        np.testing.assert_allclose(out3["poses"][1], pose_a, atol=1e-6)

    def test_slot_keyed_smoothing_would_fail(self):
        """Sanity check that the scenario actually discriminates: slot-keyed
        EMA blends ACROSS the two faces on the rank swap."""
        from headpose_tpu.runtime.smoothing import TrackSmoother

        sm = TrackSmoother(alpha=0.5)
        pose_a, pose_b = jnp.asarray([[10.0, 0, 0], [-30.0, 0, 0]])
        sm({"poses": jnp.stack([pose_a, pose_b])})
        out = sm({"poses": jnp.stack([pose_b, pose_a])})
        # slot 0 blends A-then-B: contaminated value, equals neither pose
        assert not np.allclose(out["poses"][0], pose_b, atol=1.0)


class TestLifecycle:
    def test_new_track_seeds_fresh(self):
        """A new face reusing a previously-occupied slot must seed, not blend
        with the dead track's filter state."""
        tr = IoUTrackSmoother(alpha=0.5, max_missed=0, num_slots=2)
        pose_a = jnp.asarray([50.0, 0.0, 0.0])
        boxes, valid, sig = _frame([BOX_A], [pose_a], [True])
        tr(boxes, valid, sig)
        # face A disappears; with max_missed=0 its track expires immediately
        boxes, valid, sig = _frame([jnp.zeros(4)], [jnp.zeros(3)], [False])
        tr(boxes, valid, sig)
        # a new face appears on a different spot — must seed exactly
        pose_c = jnp.asarray([-5.0, 3.0, 1.0])
        boxes, valid, sig = _frame([BOX_B], [pose_c], [True])
        out = tr(boxes, valid, sig)
        np.testing.assert_allclose(out["poses"][0], pose_c, atol=1e-6)

    def test_track_survives_brief_miss(self):
        tr = IoUTrackSmoother(alpha=0.5, max_missed=3, num_slots=4)
        pose_a = jnp.asarray([50.0, 0.0, 0.0])
        boxes, valid, sig = _frame([BOX_A], [pose_a], [True])
        tr(boxes, valid, sig)
        boxes, valid, sig = _frame([jnp.zeros(4)], [jnp.zeros(3)], [False])
        tr(boxes, valid, sig)   # one missed frame < max_missed
        boxes, valid, sig = _frame([BOX_A], [jnp.zeros(3)], [True])
        out = tr(boxes, valid, sig)
        # track survived: blends with the held state instead of reseeding
        np.testing.assert_allclose(out["poses"][0], 0.5 * pose_a, atol=1e-6)


class TestSlotOverflow:
    def test_overflow_detections_pass_through_raw(self):
        """More fresh faces than assignable slots: the overflow must NOT
        collide onto occupied slots (summing two faces into one track
        measurement) — it gets no slot and passes through unsmoothed."""
        tr = IoUTrackSmoother(alpha=0.5, num_slots=2)
        box_c = jnp.asarray([0.1, 0.6, 0.3, 0.8])
        box_d = jnp.asarray([0.6, 0.1, 0.8, 0.3])
        pose_a = jnp.asarray([40.0, 0.0, 0.0])
        pose_b = jnp.asarray([-40.0, 0.0, 0.0])
        boxes, valid, sig = _frame([BOX_A, BOX_B, box_c, box_d],
                                   [pose_a, pose_b, jnp.zeros(3),
                                    jnp.zeros(3)], [True, True, False, False])
        tr(boxes, valid, sig)   # A and B occupy both slots
        # frame 2: A and B match; C and D are fresh but no slot is available
        pose_a2 = jnp.asarray([44.0, 0.0, 0.0])
        pose_b2 = jnp.asarray([-44.0, 0.0, 0.0])
        pose_c = jnp.asarray([7.0, 8.0, 9.0])
        pose_d = jnp.asarray([-7.0, -8.0, -9.0])
        boxes, valid, sig = _frame([BOX_A, BOX_B, box_c, box_d],
                                   [pose_a2, pose_b2, pose_c, pose_d],
                                   [True, True, True, True])
        out = tr(boxes, valid, sig)
        # matched tracks smooth normally — uncorrupted by the overflow
        np.testing.assert_allclose(out["poses"][0],
                                   0.5 * pose_a + 0.5 * pose_a2, atol=1e-5)
        np.testing.assert_allclose(out["poses"][1],
                                   0.5 * pose_b + 0.5 * pose_b2, atol=1e-5)
        # overflow faces pass through raw (not zeros, not blended)
        np.testing.assert_allclose(out["poses"][2], pose_c, atol=1e-6)
        np.testing.assert_allclose(out["poses"][3], pose_d, atol=1e-6)
        # track boxes hold the matched faces' boxes, not sums
        st = tr._state
        got = np.sort(np.asarray(st.boxes)[np.asarray(st.active)], axis=0)
        want = np.sort(np.stack([BOX_A, BOX_B]), axis=0)
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestComposability:
    def test_scan_matches_python_loop(self):
        rng = np.random.default_rng(0)
        T, F = 6, 3
        boxes = jnp.asarray(rng.uniform(0.0, 0.4, size=(T, F, 4)), jnp.float32)
        boxes = boxes.at[..., 2:].add(0.3)
        valid = jnp.asarray(rng.random((T, F)) > 0.3)
        poses = jnp.asarray(rng.normal(size=(T, F, 3)), jnp.float32)

        state = tracks_init({"poses": poses[0]}, 2 * F)
        outs = []
        s = state
        for t in range(T):
            s, sm = tracks_update(s, boxes[t], valid[t], {"poses": poses[t]},
                                  alpha=0.3)
            outs.append(sm["poses"])
        looped = jnp.stack(outs)

        def step(s, inp):
            b, v, p = inp
            s, sm = tracks_update(s, b, v, {"poses": p}, alpha=0.3)
            return s, sm["poses"]

        _, scanned = jax.lax.scan(step, state, (boxes, valid, poses))
        np.testing.assert_allclose(np.asarray(scanned), np.asarray(looped),
                                   atol=1e-6)

    def test_jit_composes(self):
        state = tracks_init({"poses": jnp.zeros((2, 3))}, 4)
        step = jax.jit(lambda s, b, v, p: tracks_update(
            s, b, v, {"poses": p}, alpha=0.15))
        s, out = step(state, jnp.stack([BOX_A, BOX_B]),
                      jnp.asarray([True, True]), jnp.ones((2, 3)))
        np.testing.assert_allclose(out["poses"], 1.0, atol=1e-6)


class TestTrackSequence:
    """track_sequence: the whole-timeline scan API used by runtime.offline."""

    @staticmethod
    def _timeline(T=12, F=3, seed=5):
        rng = np.random.default_rng(seed)
        boxes = rng.uniform(0.0, 0.4, size=(T, F, 4)).astype(np.float32)
        boxes[..., 2:] += 0.3
        valid = rng.random((T, F)) > 0.3
        poses = rng.normal(size=(T, F, 3)).astype(np.float32)
        return boxes, valid, poses

    def test_matches_stateful_tracker(self):
        from headpose_tpu.runtime.tracking import (IoUTrackSmoother,
                                                   track_sequence)

        boxes, valid, poses = self._timeline()
        seq = track_sequence(boxes, valid, {"poses": poses}, alpha=0.3)
        tr = IoUTrackSmoother(alpha=0.3)
        frames = [np.asarray(tr(boxes[t], valid[t],
                                {"poses": poses[t]})["poses"])
                  for t in range(len(boxes))]
        np.testing.assert_allclose(np.asarray(seq["poses"]),
                                   np.stack(frames), atol=1e-6)

    def test_chunked_state_carry_equals_one_scan(self):
        from headpose_tpu.runtime.tracking import track_sequence

        boxes, valid, poses = self._timeline(T=10)
        whole = track_sequence(boxes, valid, {"poses": poses}, alpha=0.25)
        a, st = track_sequence(boxes[:4], valid[:4], {"poses": poses[:4]},
                               alpha=0.25, return_state=True)
        b = track_sequence(boxes[4:], valid[4:], {"poses": poses[4:]},
                           alpha=0.25, state=st)
        np.testing.assert_allclose(
            np.concatenate([np.asarray(a["poses"]), np.asarray(b["poses"])]),
            np.asarray(whole["poses"]), atol=1e-6)

    def test_offline_process_frames_tracks_crossing_faces(self):
        """Two faces swap NMS slot order mid-timeline; the tracked offline
        smoothing must keep each face's filter, where slot-keyed smoothing
        would swap them."""
        from headpose_tpu.runtime.tracking import track_sequence

        T = 6
        box_a = np.array([0.1, 0.1, 0.3, 0.3], np.float32)
        box_b = np.array([0.6, 0.6, 0.8, 0.8], np.float32)
        boxes = np.zeros((T, 2, 4), np.float32)
        poses = np.zeros((T, 2, 3), np.float32)
        for t in range(T):
            order = (0, 1) if t < 3 else (1, 0)   # slot swap at t=3
            boxes[t, order[0]] = box_a
            boxes[t, order[1]] = box_b
            poses[t, order[0]] = 10.0             # face A's signal
            poses[t, order[1]] = -10.0            # face B's signal
        valid = np.ones((T, 2), bool)
        sm = np.asarray(track_sequence(boxes, valid, {"poses": poses},
                                       alpha=0.2)["poses"])
        for t in range(T):
            a_slot = 0 if t < 3 else 1
            assert np.allclose(sm[t, a_slot], 10.0, atol=1e-5), t
            assert np.allclose(sm[t, 1 - a_slot], -10.0, atol=1e-5), t
