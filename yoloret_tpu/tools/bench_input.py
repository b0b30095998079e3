"""Host input-pipeline microbenchmark.

The reference's known bottleneck is its per-sample host chain (tf.image
ops + a py_function numpy scatter, SURVEY §3.1). This framework moves
augmentation/targets on device and keeps only file IO + JPEG entropy
decode on host (C++ libjpeg thread pool, PIL fallback). This tool
measures that host stage in isolation plus the full pipeline, across
thread counts, so the "scales with host cores" claim is a number, not
an argument:

    python -m yoloret_tpu.tools.bench_input [--n 256] [--size 320] \
        [--threads 1 2 4 8]

One JSON line per measurement. On this container (1 CPU core) thread
scaling is flat by construction — run on a real TPU-VM host for the
true curve; the loader itself is GIL-free.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def _make_dataset(root: str, n: int, hw=(480, 640)):
    from PIL import Image

    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        arr = rng.randint(0, 255, (*hw, 3), np.uint8)
        p = os.path.join(root, f"b{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        lines.append(f"{p} 10,10,100,100,0")
    ann = os.path.join(root, f"bench_train_{n}.txt")
    with open(ann, "w") as f:
        f.write("\n".join(lines) + "\n")
    return ann, [l.split()[0] for l in lines]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--repeats", type=int, default=3)
    a = p.parse_args(argv)

    root = tempfile.mkdtemp(prefix="yt_bench_input_")
    ann, paths = _make_dataset(root, a.n)

    from yoloret_tpu import native

    if native.available():
        # decode-only, native loader, per thread count
        for t in a.threads:
            best = 0.0
            for _ in range(a.repeats):
                t0 = time.perf_counter()
                _, _, fails = native.decode_resize_batch(paths, a.size, threads=t)
                dt = time.perf_counter() - t0
                best = max(best, a.n / dt)
            print(json.dumps({
                "stage": "native_decode", "threads": t,
                "images_per_sec": round(best, 1), "failures": fails,
            }), flush=True)
    else:
        print(json.dumps({"stage": "native_decode", "error": "unavailable"}))

    # decode-only, PIL fallback (single-threaded reference point)
    from PIL import Image

    best = 0.0
    for _ in range(a.repeats):
        t0 = time.perf_counter()
        for path in paths:
            im = Image.open(path).convert("RGB")
            im = im.resize((a.size, a.size))
            np.asarray(im)
        best = max(best, a.n / (time.perf_counter() - t0))
    print(json.dumps({
        "stage": "pil_decode", "threads": 1, "images_per_sec": round(best, 1),
    }), flush=True)

    # full train pipeline: decode -> device augment -> device targets
    from yoloret_tpu.data import Dataset

    anchors = np.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
         [59, 119], [116, 90], [156, 198], [373, 326]], np.float32)
    ds = Dataset(ann, a.batch, anchors, 1, input_hw=(a.size, a.size))
    n_img = 0
    t0 = time.perf_counter()
    for b in ds.build(epochs=1):
        n_img += int(b["images"].shape[0])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "stage": "full_train_pipeline", "batch": a.batch,
        "images_per_sec": round(n_img / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
