"""On-chip DynamicBatcher probe: concurrent single-frame clients vs one
synchronous client.

Through this container's TPU tunnel a synchronous single-frame ``detect()``
is round-trip-bound (~30 ms -> ~33 f/s regardless of chip rate, CLAUDE.md).
The batcher's claim (runtime/server.py) is architectural: concurrent clients
coalesce into one MXU-wide dispatch per round trip, so AGGREGATE throughput
scales with the coalescing width while each client still submits one frame
at a time.  This probe measures the claim end to end on the real chip —
real threads, real futures, the per-dispatch D2H of ``BatchResults.trim``
— at three load points (1, 8, 64 concurrent clients).

Ratios (aggregate vs the synchronous single client) are the result: both
sides are tunnel-RTT-dominated, so the container's chip-rate drift mostly
cancels.  Absolute f/s here says nothing about device throughput — that is
bench.py's number; this probe measures the serving FRONT END.

Usage:  python scripts/probe_server_tpu.py [frames_per_client]
Writes docs/server_tpu.json.
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
OUT = os.path.join(REPO, "docs", "server_tpu.json")

MAX_BATCH = 64


def _run_clients(batcher, frames, n_clients: int, per_client: int):
    """n_clients threads, each submitting per_client frames synchronously
    (submit -> wait -> submit).  Returns (wall_s, per-request latencies)."""
    barrier = threading.Barrier(n_clients + 1)
    lats: list[list[float]] = [[] for _ in range(n_clients)]

    def client(i: int) -> None:
        barrier.wait()
        for k in range(per_client):
            t0 = time.monotonic()
            res = batcher.detect(frames[(i + k) % len(frames)])
            lats[i].append(time.monotonic() - t0)
            assert res.boxes.shape[-1] == 4  # host-side ragged Results

    threads = [threading.Thread(target=client, args=(i,), daemon=True)
               for i in range(n_clients)]
    for t in threads:
        t.start()
    barrier.wait()
    t0 = time.monotonic()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    return wall, [x for per in lats for x in per]


def main():
    import numpy as np

    import jax

    from headpose_tpu.pretrained import load_flagship
    from headpose_tpu.runtime.detector import FaceDetector
    from headpose_tpu.runtime.server import DynamicBatcher

    per_client = int(sys.argv[1]) if len(sys.argv) > 1 else 20

    det = FaceDetector(*load_flagship(), precision="fast")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (128, 128, 3), dtype=np.uint8)
              for _ in range(8)]

    # pre-warm every ladder width the batcher can dispatch (a new width is
    # a new XLA program: 30-90 s through the tunnel; serving would hit each
    # exactly once — keep compiles out of the timed windows)
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

    # synchronous single-client baseline: direct detect(), no batcher
    n_base = max(per_client, 20)
    t0 = time.monotonic()
    for k in range(n_base):
        det.detect(frames[k % len(frames)][None]).trim()
    base_wall = time.monotonic() - t0
    base_fps = n_base / base_wall
    print(f"direct sync single client: {base_fps:.1f} f/s "
          f"({base_wall / n_base * 1e3:.1f} ms/frame)", flush=True)

    points = {}
    for n_clients in (1, 8, 64):
        batcher = DynamicBatcher(det, max_batch=MAX_BATCH, max_delay=0.005)
        try:
            _run_clients(batcher, frames, n_clients, 2)  # settle threads
            wall, lats = _run_clients(batcher, frames, n_clients, per_client)
            total = n_clients * per_client
            fps = total / wall
            points[str(n_clients)] = {
                "clients": n_clients,
                "frames": total,
                "aggregate_fps": round(fps, 1),
                "vs_direct_sync_client": round(fps / base_fps, 2),
                "frames_per_dispatch": round(
                    batcher.frames_served / max(batcher.dispatches, 1), 1),
                "request_latency_ms": {
                    "p50": round(statistics.median(lats) * 1e3, 1),
                    "max": round(max(lats) * 1e3, 1)},
            }
            print(f"{n_clients} clients: {fps:.1f} f/s aggregate "
                  f"({points[str(n_clients)]['frames_per_dispatch']} "
                  f"frames/dispatch, p50 latency "
                  f"{points[str(n_clients)]['request_latency_ms']['p50']} ms)",
                  flush=True)
        finally:
            batcher.close()

    report = {
        "config": f"flagship, precision='fast', max_batch={MAX_BATCH}, "
                  "max_delay=5ms, host numpy frames, trim() D2H per dispatch",
        "methodology": "threaded clients submit synchronously; aggregate "
                       "fps vs a direct single-frame sync loop — both "
                       "tunnel-RTT-bound, so drift mostly cancels; ladder "
                       "widths pre-warmed (compiles excluded)",
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
