"""Concurrent-load latency study of the HTTP serving runtime.

Drives `serve/server.py` (the micro-batching detection server) with C
concurrent closed-loop clients posting a JPEG each, and reports
p50/p90/p99 request latency plus achieved request rate per concurrency
level — the serving-latency half of the reference's deployment story
(its TF-Serving SavedModel export, code/yolo.py:351-383, leaves latency
to the TF model server; this repo's server is its own runtime, so it
gets measured here).

Run ALONE on the tunneled chip (CLAUDE.md: one TPU process at a time;
numbers include this container's ~35 ms tunnel RTT floor — the
BATCHING behavior and the curve shape are the signal, the absolute
floor is the tunnel's):

    nohup python -m yoloret_tpu.tools.bench_serve > /tmp/serve_lat.log 2>&1 &

One JSON line per concurrency level:
  {"concurrency": C, "requests": N, "p50_ms": ..., "p90_ms": ...,
   "p99_ms": ..., "rps": ..., "mean_batch": ...}
"""

from __future__ import annotations

import http.client
import io
import json
import sys
import threading
import time
from typing import List

import numpy as np


def _demo_jpeg(size: int = 320) -> bytes:
    from PIL import Image

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=85)
    return buf.getvalue()


def _client(host: str, port: int, payload: bytes, n: int,
            latencies: List[float], errors: List[str]) -> None:
    conn = http.client.HTTPConnection(host, port, timeout=60)
    for _ in range(n):
        t0 = time.perf_counter()
        try:
            conn.request("POST", "/detect", body=payload)
            resp = conn.getresponse()
            body = resp.read()
            if resp.status != 200:
                errors.append(body[:200].decode("utf-8", "replace"))
                continue
        except Exception as e:  # noqa: BLE001 - record and keep loading
            errors.append(repr(e))
            conn = http.client.HTTPConnection(host, port, timeout=60)
            continue
        latencies.append((time.perf_counter() - t0) * 1e3)


def run(concurrencies=(1, 4, 8, 16), requests_per_client: int = 40,
        max_batch: int = 8, size: int = 320, int8: bool = False):
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.serve.server import DetectionServer

    anchors = np.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
         [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)
    pred = Predictor(
        backbone="mobilenetv2x75", weights=None,
        class_names=[f"c{i}" for i in range(20)], anchors=anchors,
        input_hw=(size, size), score_threshold=0.3, use_int8=int8,
    )
    server = DetectionServer(pred, host="127.0.0.1", port=0,
                             max_batch=max_batch)
    server.start(block=False)
    payload = _demo_jpeg(size)

    # Warm-up: compile the bucket program(s) before timing.
    warm: List[float] = []
    _client("127.0.0.1", server.port, payload, 3, warm, [])
    print(f"warmup latencies: {[round(v, 1) for v in warm]} ms",
          file=sys.stderr, flush=True)

    for c in concurrencies:
        latencies: List[float] = []
        errors: List[str] = []
        threads = [
            threading.Thread(
                target=_client,
                args=("127.0.0.1", server.port, payload,
                      requests_per_client, latencies, errors))
            for _ in range(c)
        ]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        if errors:
            print(json.dumps({"concurrency": c, "errors": errors[:3],
                              "n_errors": len(errors)}), flush=True)
        if not latencies:
            continue
        arr = np.asarray(latencies)
        print(json.dumps({
            "concurrency": c,
            "requests": int(arr.size),
            "p50_ms": round(float(np.percentile(arr, 50)), 1),
            "p90_ms": round(float(np.percentile(arr, 90)), 1),
            "p99_ms": round(float(np.percentile(arr, 99)), 1),
            "mean_ms": round(float(arr.mean()), 1),
            "rps": round(arr.size / wall, 1),
        }), flush=True)
    server.stop()


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--concurrency", type=int, nargs="+",
                   default=[1, 4, 8, 16])
    p.add_argument("--requests", type=int, default=40,
                   help="requests per client")
    p.add_argument("--max_batch", type=int, default=8)
    p.add_argument("--int8", action="store_true")
    a = p.parse_args(argv)
    run(concurrencies=tuple(a.concurrency),
        requests_per_client=a.requests, max_batch=a.max_batch,
        int8=a.int8)


if __name__ == "__main__":
    main()
