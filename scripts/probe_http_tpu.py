"""On-chip probe of the FULL HTTP serving stack: PoseClient -> real sockets
-> PoseServer -> DynamicBatcher -> TPU dispatch -> JSON back.

scripts/probe_server_tpu.py measured the batcher alone (in-process futures);
this probe adds everything a network deployment adds — the .npy request
body, ThreadingHTTPServer's per-connection threads, JSON response
serialization, and the client SDK's keep-alive connections — and asks the
same question: does aggregate throughput still scale with concurrent
clients, or does the HTTP layer serialize what the batcher coalesces?

Same ratio methodology (docs/server_tpu.json): every load point and the
baseline are tunnel-RTT-dominated, so the container's chip-rate drift
mostly cancels in the vs-direct ratios.  Absolute f/s says nothing about
device throughput (that is bench.py's number).

Usage:  python scripts/probe_http_tpu.py [frames_per_client]
Writes docs/http_tpu.json.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "docs", "http_tpu.json")

MAX_BATCH = 64


def _run_http_clients(url, frames, n_clients: int, per_client: int):
    """n_clients threads, each its own PoseClient (own keep-alive socket),
    each posting per_client frames synchronously."""
    from headpose_tpu.runtime import PoseClient

    barrier = threading.Barrier(n_clients + 1)
    lats: list[list[float]] = [[] for _ in range(n_clients)]

    def client(i: int) -> None:
        with PoseClient(url) as c:
            barrier.wait()
            for k in range(per_client):
                t0 = time.monotonic()
                res = c.detect(frames[(i + k) % len(frames)])
                lats[i].append(time.monotonic() - t0)
                assert res.boxes.shape[-1] == 4

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    return time.monotonic() - t0, [x for per in lats for x in per]


def main():
    import numpy as np

    import jax

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime import PoseServer
    from headpose_tpu.runtime.detector import FaceDetector

    per_client = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    det = FaceDetector(*load_flagship(), precision="fast")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
              for _ in range(8)]

    # pre-warm every ladder width (each is a fresh XLA program, 30-90 s
    # through the tunnel — keep compiles out of the timed windows)
    widths, w = [], 1
    while w < MAX_BATCH:
        widths.append(w)
        w *= 2
    widths.append(MAX_BATCH)
    compile_s = {}
    for w in widths:
        batch = np.stack([frames[i % len(frames)] for i in range(w)])
        t0 = time.time()
        jax.block_until_ready(jax.tree.leaves(det.detect(batch)))
        compile_s[str(w)] = round(time.time() - t0, 1)
        print(f"width {w}: warmed in {compile_s[str(w)]} s", flush=True)

    # baseline: direct synchronous detect() loop, no server, no sockets
    n_base = max(per_client, 20)
    t0 = time.monotonic()
    for k in range(n_base):
        det.detect(frames[k % len(frames)][None]).trim()
    base_fps = n_base / (time.monotonic() - t0)
    print(f"direct sync single client: {base_fps:.1f} f/s", flush=True)

    points = {}
    for n_clients in (1, 8, 64):
        with PoseServer(det, port=0, max_batch=MAX_BATCH,
                        max_delay=0.005) as srv:
            _run_http_clients(srv.url, frames, n_clients, 2)  # settle
            wall, lats = _run_http_clients(srv.url, frames, n_clients,
                                           per_client)
            b = srv.batcher
            total = n_clients * per_client
            fps = total / wall
            points[str(n_clients)] = {
                "clients": n_clients,
                "frames": total,
                "aggregate_fps": round(fps, 1),
                "vs_direct_sync_client": round(fps / base_fps, 2),
                "frames_per_dispatch": round(
                    b.frames_served / max(b.dispatches, 1), 1),
                "request_latency_ms": {
                    "p50": round(statistics.median(lats) * 1e3, 1),
                    "max": round(max(lats) * 1e3, 1)},
            }
            print(f"{n_clients} clients: {fps:.1f} f/s aggregate "
                  f"({points[str(n_clients)]['frames_per_dispatch']} "
                  f"frames/dispatch, p50 "
                  f"{points[str(n_clients)]['request_latency_ms']['p50']} ms)",
                  flush=True)

    report = {
        "config": f"flagship, precision='fast', max_batch={MAX_BATCH}, "
                  "max_delay=5ms, PoseServer on localhost, one PoseClient "
                  "keep-alive connection per client thread",
        "methodology": "same ratio methodology as docs/server_tpu.json but "
                       "through the full HTTP stack (npy body -> threaded "
                       "HTTP server -> batcher -> TPU -> JSON); compiles "
                       "pre-warmed and excluded",
        "per_client_frames": per_client,
        "ladder_compile_s": compile_s,
        "direct_sync_single_client_fps": round(base_fps, 1),
        "load_points": points,
    }
    with open(OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({"direct_sync_fps": report[
        "direct_sync_single_client_fps"],
        "aggregate_fps": {k: v["aggregate_fps"] for k, v in points.items()},
        "vs_direct": {k: v["vs_direct_sync_client"]
                      for k, v in points.items()}}))
    print(f"saved {OUT}", flush=True)


if __name__ == "__main__":
    main()
