"""Postprocess configuration sweep on real TPU hardware.

Measures steady-state inference throughput (chained iterations — see
bench.py for why) of the flagship model under each postprocess
structure, to decide defaults with data instead of claims:

  * per_class / K=64  / thresh 0.3  — round-1 serving headline
  * per_class / K=256 / thresh 0.0  — round-1 MAP-grade config
  * shared    / M=64  / thresh 0.3  — shared-pool serving
  * shared    / M=256 / thresh 0.0  — shared-pool MAP-grade
  * pallas    / K=256 / thresh 0.0  — fused suppression kernel

Prints one JSON line per config to stdout (progress to stderr).

    nohup python -m yoloret_tpu.tools.bench_sweep > /tmp/sweep.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch

ANCHORS = np.asarray(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
     [59, 119], [116, 90], [156, 198], [373, 326]],
    np.float32,
)

CONFIGS = [
    # (name, pool, use_pallas, num_candidates, score_threshold)
    ("per_class_k64_t30", "per_class", False, 64, 0.3),
    ("per_class_k256_t0", "per_class", False, 256, 0.0),
    ("shared_m64_t30", "shared", False, 64, 0.3),
    ("shared_m256_t0", "shared", False, 256, 0.0),
    ("shared_m512_t0", "shared", False, 512, 0.0),
    ("pallas_k256_t0", "per_class", True, 256, 0.0),
]


@jax.jit
def _probe(im):
    return jnp.sum(im[0, 0, 0].astype(jnp.float32))


def _sync(images) -> float:
    """True completion barrier: on the tunneled (axon) backend
    jax.block_until_ready does NOT reliably wait for execution (round-3
    finding); a host readback of one derived scalar is ground truth.
    Chained loops make the final images depend on every iteration."""
    return float(np.asarray(_probe(images)))


def bench_config(model, variables, name, pool, use_pallas, k, thresh,
                 batch=256, size=320, iters=30, warmup=5, num_classes=20):
    anchors = jnp.asarray(ANCHORS)
    image_hw = jnp.full((batch, 2), float(size), jnp.float32)

    @jax.jit
    def infer(variables, images):
        outs = model.apply(variables, images, False)
        res = detect_batch(
            outs, anchors, num_classes=num_classes, image_hw=image_hw,
            score_threshold=thresh, num_candidates=k,
            pool=pool, use_pallas=use_pallas,
        )
        chained = images + 1e-12 * jnp.mean(res.scores).astype(images.dtype)
        return chained, res

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
    t_c = time.perf_counter()
    for _ in range(warmup):
        images, res = infer(variables, images)
    _sync(images)  # host readback = true completion (see _sync)
    print(f"{name}: compile+warmup {time.perf_counter() - t_c:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        images, res = infer(variables, images)
    _sync(images)
    dt = time.perf_counter() - t0
    ips = batch * iters / dt / max(1, len(jax.devices()))
    print(json.dumps({
        "config": name, "pool": pool, "pallas": use_pallas,
        "num_candidates": k, "score_threshold": thresh,
        "images_per_sec_per_chip": round(ips, 1),
        "ms_per_batch": round(dt / iters * 1e3, 2),
    }), flush=True)
    return ips


def latency_sweep(model, variables, batches=(1, 8, 32, 256), size=320,
                  num_classes=20, iters=50, warmup=5, k=64, thresh=0.3):
    """Per-request latency at small batches — the paper's actual headline
    metric is per-image FPS on-device (reference README.md:19-20,
    yolo.py:235-315 times detect() per image). Serving postprocess
    (shared pool M=64, thresh 0.3). Chained iterations: each call's input
    depends on the previous output, so the wall clock is true per-call
    latency, not dispatch rate."""
    anchors = jnp.asarray(ANCHORS)
    for batch in batches:
        image_hw = jnp.full((batch, 2), float(size), jnp.float32)

        @jax.jit
        def infer(variables, images):
            outs = model.apply(variables, images, False)
            res = detect_batch(
                outs, anchors, num_classes=num_classes, image_hw=image_hw,
                score_threshold=thresh, num_candidates=k,
            )
            chained = images + 1e-12 * jnp.mean(res.scores).astype(images.dtype)
            return chained, res

        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        t_c = time.perf_counter()
        for _ in range(warmup):
            images, res = infer(variables, images)
        _sync(images)  # warms the probe program too
        compile_s = time.perf_counter() - t_c
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            images, res = infer(variables, images)
            _sync(images)  # per-call readback: latency incl. one ~0.1 ms
            # host roundtrip (measured on a ready scalar)
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        p99 = times[min(len(times) - 1, int(len(times) * 0.99))]
        print(json.dumps({
            "config": f"latency_b{batch}", "batch": batch,
            "ms_per_batch_median": round(med * 1e3, 3),
            "ms_per_batch_p99": round(p99 * 1e3, 3),
            "ms_per_img": round(med * 1e3 / batch, 3),
            "images_per_sec": round(batch / med, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


def main():
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("configs", nargs="*", help="subset of config names")
    p.add_argument("--backbone", default="mobilenetv2x75")
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--classes", type=int, default=20)
    p.add_argument("--latency", action="store_true",
                   help="per-request latency sweep over b1/b8/b32/b256")
    p.add_argument("--latency_batches", default="1,8,32,256")
    a = p.parse_args()

    model = build_detector(a.backbone, num_classes=a.classes, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, a.size, a.size, 3), jnp.float32),
        False,
    )
    if a.latency:
        latency_sweep(
            model, variables,
            batches=tuple(int(b) for b in a.latency_batches.split(",")),
            size=a.size, num_classes=a.classes,
        )
        return
    for cfg in CONFIGS:
        if a.configs and cfg[0] not in a.configs:
            continue
        try:
            bench_config(model, variables, *cfg, batch=a.batch, size=a.size,
                         num_classes=a.classes)
        except Exception as e:  # keep sweeping; report the failure
            print(json.dumps({"config": cfg[0], "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
