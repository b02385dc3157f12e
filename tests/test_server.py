"""DynamicBatcher (runtime/server.py): many single-frame clients coalesced
into wide dispatches of the one jitted program.

The reference serves exactly one synchronous camera loop; this is the
multi-client front end a production deployment needs (docs/BENCH.md batch
sweep: wall time is ~flat batch 1→128, so unbatched single-frame serving
wastes the dispatch)."""
from __future__ import annotations

import os
import threading

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from headpose_tpu.runtime import DynamicBatcher
pytestmark = pytest.mark.heavy  # socket servers: the heavy lane (CLAUDE.md test tiers)


GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture()
def frames():
    rng = np.random.default_rng(0)
    golden = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))["imgs"]
    idx = rng.permutation(len(golden))[:12]
    return [golden[i] for i in idx]


class TestDynamicBatcher:
    def test_results_match_direct_detect(self, production_detector, frames):
        """Each client's ragged Results equals the detector's own answer for
        its frame — batching (and first-frame padding) never leaks across
        rows."""
        direct = production_detector.detect(np.stack(frames)).trim()
        with DynamicBatcher(production_detector, max_batch=16,
                            max_delay=0.25) as srv:
            futs = [srv.submit(f) for f in frames]
            got = [f.result(timeout=120) for f in futs]
        assert srv.frames_served == len(frames)
        for g, d in zip(got, direct):
            assert len(g) == len(d)
            np.testing.assert_allclose(g.boxes, d.boxes, rtol=1e-6, atol=1e-6)
            np.testing.assert_allclose(g.poses, d.poses, rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(g.scores, d.scores,
                                       rtol=1e-6, atol=1e-6)

    def test_concurrent_clients_coalesce(self, production_detector, frames):
        """12 threads each submitting one frame produce FAR fewer device
        dispatches than requests (that is the whole point), and every
        client gets its own answer."""
        with DynamicBatcher(production_detector, max_batch=16,
                            max_delay=0.25) as srv:
            results = [None] * len(frames)

            def client(i):
                results[i] = srv.detect(frames[i], timeout=120)

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(len(frames))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert srv.frames_served == len(frames)
            assert srv.dispatches <= len(frames) // 2, srv.dispatches
        direct = production_detector.detect(np.stack(frames)).trim()
        for got, want in zip(results, direct):
            assert len(got) == len(want)
            np.testing.assert_allclose(got.poses, want.poses,
                                       rtol=1e-5, atol=1e-5)

    def test_mesh_detector_granularity(self, unified_native, frames):
        """A dp mesh-sharded detector only serves batches divisible by the
        data-axis size; the batcher builds its pad ladder on
        detector.batch_granularity so every dispatch width is servable —
        even a lone request pads up to one shard row per device."""
        from headpose_tpu.parallel import create_mesh
        from headpose_tpu.runtime import FaceDetector

        model, params = unified_native
        mesh = create_mesh(8)
        det = FaceDetector(model, params, score_threshold=0.05, mesh=mesh)
        assert det.batch_granularity == 8
        plain = FaceDetector(model, params, score_threshold=0.05)

        with DynamicBatcher(det, max_batch=12, max_delay=0.05) as b:
            assert b.widths == (8, 16)  # granularity-scaled, cap rounded up
            want = plain.detect(np.stack(frames[:3])).trim()
            futs = [b.submit(f) for f in frames[:3]]
            for fut, w in zip(futs, want):
                got = fut.result(timeout=120)
                np.testing.assert_allclose(got.poses, w.poses,
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(got.boxes, w.boxes,
                                           rtol=1e-5, atol=1e-5)
            assert b.frames_served == 3

    def test_contract_errors(self, production_detector, frames):
        srv = DynamicBatcher(production_detector, max_batch=4,
                             max_delay=0.01)
        try:
            with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
                srv.submit(np.stack(frames[:2]))          # a batch, not a frame
            with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
                srv.submit(np.zeros((64, 64, 4), np.uint8))   # RGBA channels
            srv.submit(frames[0]).result(timeout=120)
            with pytest.raises(ValueError, match="one shape"):
                srv.submit(frames[0][:64])                # mixed frame sizes
        finally:
            assert srv.close() is True
        with pytest.raises(RuntimeError, match="closed"):
            srv.submit(frames[0])

    def test_cancelled_future_does_not_kill_dispatcher(
            self, production_detector, frames):
        """A client cancelling its pending future must not crash the
        dispatcher thread (set_result on a cancelled Future raises
        InvalidStateError) — later requests still get served."""
        with DynamicBatcher(production_detector, max_batch=4,
                            max_delay=0.2) as srv:
            doomed = srv.submit(frames[0])
            assert doomed.cancel() or doomed.done()
            # dispatcher survives: a fresh request round-trips
            res = srv.detect(frames[1], timeout=120)
            assert res is not None
            assert srv.frames_served >= 1

    def test_close_flushes_queued_work(self, production_detector, frames):
        srv = DynamicBatcher(production_detector, max_batch=4,
                             max_delay=0.01)
        futs = [srv.submit(f) for f in frames[:6]]
        assert srv.close(timeout=120) is True
        for f in futs:
            assert f.result(timeout=1) is not None
