"""Stock vs fused-backbone inference benchmark on real TPU hardware.

Measures the Pallas fused-MBConv path (nn/fused_infer.py) against the
stock XLA conv stack, model-only and full pipeline, with the
readback-synchronized chained timing (see tools/roofline.py).

    nohup python -m yoloret_tpu.tools.bench_fused > /tmp/fused.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.nn.fused_infer import fused_detector_apply
from yoloret_tpu.ops import detect_batch
from yoloret_tpu.tools.roofline import measure_stage

ANCHORS = np.asarray(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
     [59, 119], [116, 90], [156, 198], [373, 326]],
    np.float32,
)


def main(batch=256, size=320, num_classes=20, backbone="mobilenetv2x75",
         iters=50):
    model = build_detector(backbone, num_classes=num_classes,
                           dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32),
        False,
    )
    anchors = jnp.asarray(ANCHORS)
    image_hw = jnp.full((batch, 2), float(size), jnp.float32)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32))

    def stock_model(x, v):
        return model.apply(v, x, False)

    def fused_model(x, v):
        return fused_detector_apply(model, v, x)

    def fused_model_v2(x, v):
        return fused_detector_apply(model, v, x, version=2)

    def post(outs):
        return detect_batch(
            outs, anchors, num_classes=num_classes, image_hw=image_hw,
            score_threshold=0.3, num_candidates=64,
        )

    def stock_pipeline(x, v):
        return post(stock_model(x, v))

    def fused_pipeline(x, v):
        return post(fused_model(x, v))

    # numerical check on-device first: same detections
    a = jax.jit(stock_model)(images[:8], variables)
    for tag, fn in (("fused", fused_model), ("fused_v2", fused_model_v2)):
        b = jax.jit(fn)(images[:8], variables)
        for ya, yb in zip(a, b):
            d = float(jnp.max(jnp.abs(ya - yb)))
            print(f"max |stock - {tag}| = {d:.5f}", file=sys.stderr)
    for name, fn in (
        ("stock_model", stock_model),
        ("fused_model", fused_model),
        ("fused_model_v2", fused_model_v2),
        ("stock_pipeline", stock_pipeline),
        ("fused_pipeline", fused_pipeline),
    ):
        print(f"{name}: compiling...", file=sys.stderr, flush=True)
        try:
            rec = measure_stage(name, fn, (images, variables), batch,
                                iters=iters)
            print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                              for k, v in rec.items()}), flush=True)
        except Exception as e:
            print(json.dumps({"stage": name, "error": repr(e)[:400]}),
                  flush=True)


if __name__ == "__main__":
    main()
