"""Split-program study of the MAP-grade compile cliff.

The fused shared-pool postprocess hits an XLA-TPU backend-pass compile
cliff at large batch*num_candidates: b128/M512 compiles in 330-920 s
server-side while the same HLO compiles for CPU in 6 s, and the top-k /
suppression loop each compile in seconds in isolation (round-3 study,
note in ops/postprocess.py::detect_batch). This tool measures whether
jitting the pipeline as TWO programs — (model + candidate selection +
decode) and (greedy suppression) — restores sane compile times, and what
the split costs at runtime (one extra program dispatch per batch plus a
[B,M,4]+[B,C,M] HBM round trip, ~6 MB at the MAP-grade config).

    nohup python -m yoloret_tpu.tools.compile_split > /tmp/split.log 2>&1 &

Prints one JSON line per case: compile seconds per half, chained
throughput for the split (2 dispatches/iteration — the tunnel charges a
~2-3 ms per-execution floor, so the chip-true split number is the
measured one minus one dispatch floor), and optionally the fused program
for direct comparison (--fused; WARNING: that compile is the 330-920 s
cliff itself).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch, shared_pool_candidates, shared_pool_suppress
from yoloret_tpu.tools.roofline import ANCHORS, chip_peaks, measure_stage, sync_scalar


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--candidates", type=int, default=512)
    p.add_argument("--score_threshold", type=float, default=0.0)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--backbone", default="mobilenetv2x75")
    p.add_argument("--fused", action="store_true",
                   help="also compile+time the fused program (the cliff)")
    a = p.parse_args()

    nc = 20
    model = build_detector(a.backbone, num_classes=nc, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, a.size, a.size, 3)), False)
    anchors = jnp.asarray(np.asarray(ANCHORS))
    image_hw = jnp.full((a.batch, 2), float(a.size), jnp.float32)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        rng.randint(0, 256, (a.batch, a.size, a.size, 3), np.uint8))

    def stage_a(x, fb, v, hw):
        # fb chains iteration i+1 on iteration i's suppression output so
        # the device must run the two programs back to back.
        x = x + fb.astype(x.dtype)
        xf = x.astype(jnp.float32) * (1.0 / 255.0)
        outs = model.apply(v, xf, False)
        return shared_pool_candidates(
            outs, anchors, nc, hw, num_candidates=a.candidates)

    def stage_b(boxes, scores):
        res = shared_pool_suppress(
            boxes, scores, score_threshold=a.score_threshold)
        fb = (jnp.sum(res.scores) * 1e-12).astype(jnp.float32)
        return res, fb

    kind, pf, pb = chip_peaks()
    fb = jnp.zeros((), jnp.float32)

    print("compiling stage A (model+candidates)...", file=sys.stderr, flush=True)
    ja = jax.jit(stage_a)
    t0 = time.perf_counter()
    ca = ja.lower(imgs, fb, variables, image_hw).compile()
    boxes, scores = ca(imgs, fb, variables, image_hw)
    sync_scalar(boxes)
    compile_a = time.perf_counter() - t0

    print("compiling stage B (suppression)...", file=sys.stderr, flush=True)
    jb = jax.jit(stage_b)
    t0 = time.perf_counter()
    cb = jb.lower(boxes, scores).compile()
    res, fb1 = cb(boxes, scores)
    sync_scalar(fb1)
    compile_b = time.perf_counter() - t0

    # Chained split timing: every iteration is two program executions.
    x = imgs
    for _ in range(5):
        boxes, scores = ja(x, fb, variables, image_hw)
        _, fb = jb(boxes, scores)
    sync_scalar(fb)
    t0 = time.perf_counter()
    for _ in range(a.iters):
        boxes, scores = ja(x, fb, variables, image_hw)
        _, fb = jb(boxes, scores)
    sync_scalar(fb)
    dt = (time.perf_counter() - t0) / a.iters
    print(json.dumps(dict(
        case="split", batch=a.batch, candidates=a.candidates,
        compile_a_s=round(compile_a, 1), compile_b_s=round(compile_b, 1),
        ms_per_batch=round(dt * 1e3, 3),
        img_per_sec=round(a.batch / dt, 1), device=kind)), flush=True)

    if a.fused:
        def fused(x, v, hw):
            xf = x.astype(jnp.float32) * (1.0 / 255.0)
            outs = model.apply(v, xf, False)
            return detect_batch(
                outs, anchors, num_classes=nc, image_hw=hw,
                score_threshold=a.score_threshold,
                num_candidates=a.candidates)
        print("compiling FUSED (expect the cliff)...", file=sys.stderr,
              flush=True)
        rec = measure_stage("fused", fused, (imgs, variables, image_hw),
                            a.batch, iters=a.iters)
        rec.update(case="fused", candidates=a.candidates, device=kind)
        print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                          for k, v in rec.items()}), flush=True)


if __name__ == "__main__":
    main()
