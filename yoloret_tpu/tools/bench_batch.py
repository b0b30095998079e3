"""Batch-size and input-dtype sweep for the serving pipeline, with the
readback-synchronized timing (round 3 found jax.block_until_ready does
not reliably wait on this backend — the round-2 conclusion that b512
regresses was made with block-based timing and needs re-measurement).

Also measures the uint8-input variant: serving transfers uint8 (4x
smaller H2D) and normalizes on device — the Predictor already does this
(infer/predictor.py); the bench should measure the same program.

    nohup python -m yoloret_tpu.tools.bench_batch > /tmp/batch.log 2>&1 &
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch
from yoloret_tpu.tools.roofline import measure_stage

ANCHORS = np.asarray(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
     [59, 119], [116, 90], [156, 198], [373, 326]],
    np.float32,
)


def main(size=320, num_classes=20, backbone="mobilenetv2x75", iters=50):
    model = build_detector(backbone, num_classes=num_classes,
                           dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32),
        False,
    )
    anchors = jnp.asarray(ANCHORS)
    rng = np.random.RandomState(0)

    def make(batch, u8):
        image_hw = jnp.full((batch, 2), float(size), jnp.float32)

        def pipeline(x, v):
            if u8:
                x = x.astype(jnp.float32) * (1.0 / 255.0)
            outs = model.apply(v, x, False)
            return detect_batch(
                outs, anchors, num_classes=num_classes, image_hw=image_hw,
                score_threshold=0.3, num_candidates=64,
            )

        if u8:
            imgs = jnp.asarray(
                rng.randint(0, 256, (batch, size, size, 3), np.uint8))
        else:
            imgs = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))
        return pipeline, imgs

    cases = [(128, False), (256, False), (384, False), (512, False),
             (256, True)]
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("cases", nargs="*",
                   help="e.g. b128_u8 b256_f32 (default: built-in list)")
    p.add_argument("--inner", type=int, default=1,
                   help="in-program chained repeats (amortizes the "
                        "tunnel's per-execution dispatch floor)")
    a = p.parse_args()
    if a.cases:
        cases = [(int(c.split("_")[0][1:]), c.endswith("u8"))
                 for c in a.cases]
    for batch, u8 in cases:
        name = f"b{batch}" + ("_u8" if u8 else "_f32")
        print(f"{name}: compiling...", file=sys.stderr, flush=True)
        try:
            fn, imgs = make(batch, u8)
            rec = measure_stage(name, fn, (imgs, variables), batch,
                                iters=iters, inner_repeats=a.inner)
            print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                              for k, v in rec.items()}), flush=True)
        except Exception as e:
            print(json.dumps({"stage": name, "error": repr(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
