"""PoseServer (runtime/http.py): the network-facing serving front end.

The reference's only application surface is one synchronous webcam loop
(blazeFaceDetectorH5.py:366-449); this endpoint serves many HTTP clients
whose concurrent requests coalesce through the DynamicBatcher into wide
dispatches of the one jitted program.  On-chip behaviour of the batcher
under this load shape: docs/server_tpu.json."""
from __future__ import annotations

import io
import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

pytest.importorskip("jax")

from headpose_tpu.runtime import PoseServer
from headpose_tpu.runtime import http as http_mod
pytestmark = pytest.mark.heavy  # socket servers: the heavy lane (CLAUDE.md test tiers)


GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture()
def frames():
    rng = np.random.default_rng(1)
    golden = np.load(os.path.join(GOLDEN, "parity_corpus.npz"))["imgs"]
    idx = rng.permutation(len(golden))[:12]
    return [golden[i] for i in idx]


@pytest.fixture()
def server(production_detector):
    with PoseServer(production_detector, port=0, max_batch=16,
                    max_delay=0.25) as srv:
        yield srv


def _post_frame_raw(url: str, body: bytes) -> dict:
    req = urllib.request.Request(f"{url}/v1/detect", data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.status == 200
        return json.load(resp)


def _post_frame(url: str, frame: np.ndarray) -> dict:
    buf = io.BytesIO()
    np.save(buf, frame)
    return _post_frame_raw(url, buf.getvalue())


def _get(url: str, route: str):
    with urllib.request.urlopen(f"{url}{route}", timeout=30) as resp:
        return resp.status, json.load(resp)


class TestPoseServer:
    def test_concurrent_requests_match_direct_detect(self, server,
                                                     production_detector,
                                                     frames):
        """Concurrent HTTP clients each get exactly the detector's own
        answer for their frame, and the requests coalesce into far fewer
        device dispatches than requests."""
        direct = production_detector.detect(np.stack(frames)).trim()
        results = [None] * len(frames)

        def client(i):
            results[i] = _post_frame(server.url, frames[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(frames))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for got, want in zip(results, direct):
            assert got["count"] == len(want)
            faces = got["faces"]
            assert len(faces) == len(want)
            for k, face in enumerate(faces):
                np.testing.assert_allclose(face["box"], want.boxes[k],
                                           rtol=1e-5, atol=1e-5)
                np.testing.assert_allclose(face["pose"], want.poses[k],
                                           rtol=1e-4, atol=1e-4)
                np.testing.assert_allclose(face["keypoints"],
                                           want.keypoints[k],
                                           rtol=1e-5, atol=1e-5)
                assert face["score"] == pytest.approx(
                    float(want.scores[k]), rel=1e-5)

        status, stats = _get(server.url, "/v1/stats")
        assert status == 200
        assert stats["frames_served"] == len(frames)
        assert stats["dispatches"] <= len(frames) // 2, stats
        assert stats["frames_per_dispatch"] > 1
        assert stats["requests"] == len(frames)
        assert stats["errors"] == 0
        assert stats["latency_ms"]["window"] == len(frames)
        assert 0 < stats["latency_ms"]["p50"] <= stats["latency_ms"]["p99"]

    def test_health(self, server):
        status, body = _get(server.url, "/v1/health")
        assert status == 200 and body == {"status": "ok"}

    def test_error_routes_and_payloads(self, server, frames):
        # unknown route
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(server.url, "/v1/nope")
        assert e.value.code == 404

        # garbage body: neither .npy nor an image (magic-byte sniff)
        req = urllib.request.Request(f"{server.url}/v1/detect",
                                     data=b"not-npy", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        assert "npy" in json.load(e.value)["error"]

        # JPEG magic but truncated/corrupt: sniffs as image, fails decode
        req = urllib.request.Request(f"{server.url}/v1/detect",
                                     data=b"\xff\xd8\xff-corrupt",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        assert "undecodable" in json.load(e.value)["error"]

        # a batch, not a frame: the batcher's (H, W, 3) contract -> 400
        buf = io.BytesIO()
        np.save(buf, np.stack(frames[:2]))
        req = urllib.request.Request(f"{server.url}/v1/detect",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        assert "(H, W, 3)" in json.load(e.value)["error"]

        # empty body
        req = urllib.request.Request(f"{server.url}/v1/detect", data=b"",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

        # the server keeps serving after errors, and counted them
        status, stats = _get(server.url, "/v1/stats")
        assert status == 200 and stats["errors"] == 4

    def test_jpeg_and_png_bodies(self, server, production_detector, frames):
        """An encoded image body (what `curl --data-binary @face.jpg`
        sends) decodes server-side to the same BGR contract: PNG round-trips
        losslessly to the np.save answer; JPEG agrees on the detection
        count."""
        cv2 = pytest.importorskip("cv2")

        frame = frames[0]
        want = production_detector.detect(frame[None]).trim()[0]

        ok, png = cv2.imencode(".png", frame)
        assert ok
        got = _post_frame_raw(server.url, png.tobytes())
        assert got["count"] == len(want)
        for k, face in enumerate(got["faces"]):
            np.testing.assert_allclose(face["pose"], want.poses[k],
                                       rtol=1e-4, atol=1e-4)

        # JPEG is lossy (and the parity-corpus images are adversarially
        # detection-dense), so the contract is TRANSPORT parity: the server's
        # answer for a JPEG body == the detector run on the decoded JPEG.
        ok, jpg = cv2.imencode(".jpg", frame,
                               [cv2.IMWRITE_JPEG_QUALITY, 98])
        assert ok
        decoded = cv2.imdecode(jpg, cv2.IMREAD_COLOR)
        want_jpg = production_detector.detect(decoded[None]).trim()[0]
        got = _post_frame_raw(server.url, jpg.tobytes())
        assert got["count"] == len(want_jpg)
        for k, face in enumerate(got["faces"]):
            np.testing.assert_allclose(face["pose"], want_jpg.poses[k],
                                       rtol=1e-4, atol=1e-4)

    def test_image_body_without_opencv_is_415(self, server, frames,
                                              monkeypatch):
        """On a host without OpenCV an image body is 415 (unsupported
        media), not a crash — and npy bodies still work."""
        import sys

        cv2 = pytest.importorskip("cv2")

        ok, png = cv2.imencode(".png", frames[0])
        assert ok
        monkeypatch.setitem(sys.modules, "cv2", None)  # import cv2 -> error
        req = urllib.request.Request(f"{server.url}/v1/detect",
                                     data=png.tobytes(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 415
        assert "OpenCV" in json.load(e.value)["error"]
        assert _post_frame(server.url, frames[0])["count"] >= 0

    def test_metrics_prometheus_exposition(self, server, frames):
        _post_frame(server.url, frames[0])
        req = urllib.request.Request(f"{server.url}/metrics")
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
        assert "headpose_frames_served_total 1" in text
        assert "headpose_requests_total 1" in text
        assert "headpose_errors_total 0" in text
        assert '_latency_seconds{quantile="0.5"}' in text
        # every non-comment line is `name[{labels}] value` — parseable
        for line in text.splitlines():
            if line and not line.startswith("#"):
                name, value = line.rsplit(" ", 1)
                float(value)

    def test_fuzz_bodies_never_kill_the_server(self, server, frames):
        """50 adversarial bodies — random bytes, truncated npy/JPEG/PNG
        magic, wrong dtypes/shapes/ndim — every one gets a clean JSON error
        (4xx, never 5xx) and the server keeps serving real work after."""
        rng = np.random.default_rng(0)
        bodies = [rng.bytes(rng.integers(1, 4096)) for _ in range(20)]
        for magic in (b"\x93NUMPY", b"\xff\xd8\xff", b"\x89PNG\r\n\x1a\n"):
            bodies += [magic, magic + rng.bytes(64),
                       magic + b"\x00" * 100]
        for arr in (np.zeros((4,), np.float32),          # wrong ndim
                    np.zeros((2, 2), np.uint8),          # wrong ndim
                    np.zeros((8, 8, 4), np.uint8),       # wrong channels
                    np.zeros((0, 0, 3), np.uint8),       # empty dims
                    np.zeros((2, 3, 4, 3), np.uint8)):   # a batch
            buf = io.BytesIO()
            np.save(buf, arr)
            bodies.append(buf.getvalue())
        codes = []
        for body in bodies:
            req = urllib.request.Request(f"{server.url}/v1/detect",
                                         data=body, method="POST")
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            codes.append(e.value.code)
        assert all(400 <= c < 500 for c in codes), codes
        # still alive and correct
        assert _post_frame(server.url, frames[0])["count"] >= 0
        status, stats = _get(server.url, "/v1/stats")
        assert stats["errors"] == len(bodies)

    def test_batch_row_cap(self, server):
        """One small body cannot flood the batcher: more rows than
        MAX_BATCH_ROWS (a degenerate (B, 1, 2, 3) array passes every
        byte/shape check) is 400 BEFORE any row is submitted — so the bad
        request cannot pin the server's frame shape either."""
        big = np.zeros((http_mod.MAX_BATCH_ROWS + 1, 1, 2, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, big)
        req = urllib.request.Request(f"{server.url}/v1/detect_batch",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=30)
        assert exc.value.code == 400
        assert "at most" in json.load(exc.value)["error"]
        assert _get(server.url, "/v1/stats")[1]["frame_shape"] is None

    def test_oversized_body_rejected(self, server, frames, monkeypatch):
        monkeypatch.setattr(http_mod, "MAX_BODY_BYTES", 1024)
        buf = io.BytesIO()
        np.save(buf, frames[0])
        req = urllib.request.Request(f"{server.url}/v1/detect",
                                     data=buf.getvalue(), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 413

    def test_frame_shape_pin(self, production_detector, frames):
        """An explicitly pinned server 400s odd-sized frames with the
        expected shape in the message — one odd first request can NOT
        decide the shape every later client must match — and reports the
        pin in /v1/stats."""
        with PoseServer(production_detector, port=0, max_batch=4,
                        max_delay=0.01, frame_shape=(128, 128)) as srv:
            status, stats = _get(srv.url, "/v1/stats")
            assert stats["frame_shape"] == [128, 128, 3]
            buf = io.BytesIO()
            np.save(buf, np.zeros((64, 64, 3), np.uint8))
            req = urllib.request.Request(f"{srv.url}/v1/detect",
                                         data=buf.getvalue(), method="POST")
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req, timeout=30)
            assert e.value.code == 400
            assert "(128, 128, 3)" in json.load(e.value)["error"]
            # the pin survives the bad request; matching frames serve
            assert _post_frame(srv.url, frames[0])["count"] >= 0

    def test_close_is_clean(self, production_detector, frames):
        srv = PoseServer(production_detector, port=0, max_batch=4,
                         max_delay=0.01)
        assert _post_frame(srv.url, frames[0])["count"] >= 0
        assert srv.close() is True
        # socket is gone: connections are refused, nothing hangs
        with pytest.raises(urllib.error.URLError):
            urllib.request.urlopen(f"{srv.url}/v1/health", timeout=5)
