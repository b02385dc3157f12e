"""PoseClient (runtime/client.py): the Python SDK over the PoseServer wire.

Server + client together replace the reference's only application surface
(one synchronous webcam loop, blazeFaceDetectorH5.py:366-449) with a
production deployment story; these tests drive a real server over real
sockets and check the client returns the detector's own answers as native
Results."""
from __future__ import annotations

import os

import numpy as np
import pytest

pytest.importorskip("jax")

from headpose_tpu.runtime import PoseClient, PoseServer
from headpose_tpu.runtime.results import Results
pytestmark = pytest.mark.heavy  # socket servers: the heavy lane (CLAUDE.md test tiers)


GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture()
def frames():
    rng = np.random.default_rng(7)
    golden = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))["imgs"]
    idx = rng.permutation(len(golden))[:10]
    return [golden[i] for i in idx]


@pytest.fixture()
def server(production_detector):
    with PoseServer(production_detector, port=0, max_batch=16,
                    max_delay=0.25) as srv:
        yield srv


def _assert_matches(got: Results, want: Results) -> None:
    assert isinstance(got, Results)
    assert len(got) == len(want)
    np.testing.assert_allclose(got.boxes, want.boxes, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got.keypoints, want.keypoints,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got.scores, want.scores, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got.poses, want.poses, rtol=1e-4, atol=1e-4)


class TestPoseClient:
    def test_detect_roundtrip_keepalive(self, server, production_detector,
                                        frames):
        """Sequential detects over ONE kept-alive connection return the
        detector's own answers as native ragged Results."""
        want = production_detector.detect(np.stack(frames[:3])).trim()
        with PoseClient(server.url) as client:
            for frame, w in zip(frames[:3], want):
                _assert_matches(client.detect(frame), w)
            # all three rode one connection: the server saw 3 requests
            # and no errors (an error reply would have closed the socket)
            stats = client.stats()
            assert stats["requests"] == 3 and stats["errors"] == 0

    def test_detect_many_concurrent_and_ordered(self, server,
                                                production_detector, frames):
        """Fan-out returns results in input order, and the in-flight window
        coalesced into fewer device dispatches than frames."""
        want = production_detector.detect(np.stack(frames)).trim()
        with PoseClient(server.url) as client:
            got = client.detect_many(frames, concurrency=len(frames))
            for g, w in zip(got, want):
                _assert_matches(g, w)
            stats = client.stats()
            assert stats["frames_served"] == len(frames)
            assert stats["dispatches"] <= len(frames) // 2, stats
            assert client.detect_many([]) == []

    def test_empty_frame_gives_empty_results(self, server):
        """A faceless frame comes back as a zero-length Results with the
        contract shapes (not a crash on empty JSON lists)."""
        with PoseClient(server.url) as client:
            res = client.detect(np.zeros((128, 128, 3), np.uint8))
        assert len(res) == 0
        assert res.boxes.shape == (0, 4)
        assert res.keypoints.shape == (0, 6, 2)
        assert res.poses.shape == (0, 3)

    def test_error_mapping_and_recovery(self, server, frames):
        """Bad frames raise ValueError with the server's message; the
        client transparently reconnects after the server's error-path
        connection close and keeps working."""
        with PoseClient(server.url) as client:
            with pytest.raises(ValueError, match=r"\(H, W, 3\)"):
                client.detect(np.stack(frames[:2]))  # a batch, not a frame
            # the 400 reply closed the connection; the next call rebuilds it
            assert len(client.detect(frames[0])) >= 0
            assert client.health() == {"status": "ok"}

    def test_url_forms_and_close(self, server, frames):
        """host:port without a scheme parses; closed clients refuse calls."""
        client = PoseClient(f"{server.host}:{server.port}")
        assert client.health() == {"status": "ok"}
        client.close()
        with pytest.raises(RuntimeError, match="closed"):
            client.detect(frames[0])
        with pytest.raises(ValueError, match="http"):
            PoseClient("https://example.com")
        # scheme-explicit URL without a port means the scheme's standard
        # port, not the CLI default; bare host keeps the CLI default
        assert PoseClient("http://example.com")._port == 80
        assert PoseClient("example.com")._port == 8000
        assert PoseClient("http://example.com:8123")._port == 8123
        # path prefixes would be silently dropped — refuse them loudly
        with pytest.raises(ValueError, match="prefix"):
            PoseClient("http://example.com:8000/pose")

    def test_detect_many_pool_persists(self, server, frames):
        """The fan-out pool (and its keep-alive connections) is reused
        across calls — a streaming loop pays TCP handshakes once."""
        with PoseClient(server.url) as client:
            client.detect_many(frames[:3], concurrency=3)
            pool = client._pool
            client.detect_many(frames[3:6], concurrency=3)
            assert client._pool is pool
            client.detect_many(frames[:2], concurrency=8)  # grows once
            assert client._pool is not pool
        assert client._pool is None  # close() shut it down

    def test_detect_batch_one_round_trip(self, server, production_detector,
                                         frames):
        """B frames in one request come back per-frame identical to the
        detector, and the whole batch cost at most a couple of dispatches."""
        want = production_detector.detect(np.stack(frames[:6])).trim()
        with PoseClient(server.url) as client:
            got = client.detect_batch(np.stack(frames[:6]))
            assert len(got) == 6
            for g, w in zip(got, want):
                _assert_matches(g, w)
            stats = client.stats()
            assert stats["requests"] == 1          # ONE round trip
            assert stats["frames_served"] == 6
            assert stats["dispatches"] <= 2
            with pytest.raises(ValueError, match=r"\(B, H, W, 3\)"):
                client.detect_batch(frames[0])     # a frame, not a batch

    def test_detect_batch_chunks_transparently(self, server,
                                               production_detector, frames):
        """A batch bigger than the per-request chunk budget splits into
        several requests (the server caps rows and bytes per request,
        runtime/http.py) but still returns ONE ordered result list."""
        want = production_detector.detect(np.stack(frames[:6])).trim()
        with PoseClient(server.url) as client:
            client._CHUNK_ROWS = 2            # instance override: 3 chunks
            got = client.detect_batch(np.stack(frames[:6]))
            assert len(got) == 6
            for g, w in zip(got, want):
                _assert_matches(g, w)
            assert client.stats()["requests"] == 3   # ceil(6/2) round trips

            # the byte budget chunks too: a budget of ~2 frames -> 2-row
            # chunks even with the row cap wide open
            client._CHUNK_ROWS = 512
            client._CHUNK_BYTES = frames[0].nbytes * 2 + 1
            got = client.detect_batch(np.stack(frames[:4]))
            assert len(got) == 4
            assert client.stats()["requests"] == 3 + 2

    def test_from_ragged_roundtrip(self, server, production_detector,
                                   frames):
        """BatchResults.from_ragged is trim()'s exact inverse — remote
        ragged results re-enter the padded pipeline losslessly."""
        from headpose_tpu.runtime.results import BatchResults

        want = production_detector.detect(np.stack(frames[:4])).trim()
        again = BatchResults.from_ragged(want, max_faces=32).trim()
        for w, a in zip(want, again):
            assert len(w) == len(a)
            np.testing.assert_array_equal(w.boxes, a.boxes)
            np.testing.assert_array_equal(w.poses, a.poses)
            np.testing.assert_array_equal(w.scores, a.scores)
            np.testing.assert_array_equal(w.keypoints, a.keypoints)
        # overflow keeps the top (score-descending) rows
        capped = BatchResults.from_ragged(want, max_faces=1).trim()
        for w, c in zip(want, capped):
            if len(w):
                assert len(c) == 1
                np.testing.assert_array_equal(c.boxes[0], w.boxes[0])

    def test_demo_over_server(self, server, tmp_path, monkeypatch):
        """The reference's one application surface (the camera loop) runs
        against a remote endpoint: demo --server does detection over HTTP
        while smoothing/tracking/drawing stay local."""
        cv2 = pytest.importorskip("cv2")
        from headpose_tpu.runtime.demo import run_demo

        video = str(tmp_path / "in.mp4")
        w = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"mp4v"), 10.0,
                            (128, 128))
        rng = np.random.default_rng(3)
        for _ in range(3):
            w.write(rng.integers(0, 256, (128, 128, 3)).astype(np.uint8))
        w.release()
        monkeypatch.chdir(tmp_path)
        assert run_demo(server=server.url, source=video, display=False,
                        max_frames=2) == 2
        with pytest.raises(ValueError, match="server"):
            run_demo(server=server.url, source=video, display=False,
                     precision="turbo")

    def test_stale_connection_retry(self, server, frames):
        """A connection the server side has dropped (here: forced stale by
        closing the client's socket out from under it) is rebuilt and the
        request retried once, invisibly."""
        with PoseClient(server.url) as client:
            first = client.detect(frames[0])
            client._local.conn.sock.close()  # simulate idle reap / restart
            again = client.detect(frames[0])
            _assert_matches(again, first)
