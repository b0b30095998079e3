"""FLOPs / memory-traffic profiler.

The reference measured per-block FLOPs with a tf.profiler script on
placeholder graphs (reference: code/yolo3/efficientnet_computations.py:
1239-1273) and wall-clock timers around inference (code/yolo.py:239,273).
The XLA-native equivalent: ``jit(fn).lower(...).compile().cost_analysis()``
for FLOPs/bytes, plus ``jax.profiler`` trace hooks for timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def cost_analysis(
    backbone: str = "mobilenetv2x75",
    input_hw: Tuple[int, int] = (320, 320),
    batch: int = 1,
    num_classes: int = 20,
) -> Dict[str, float]:
    """FLOPs + HBM bytes of the detector forward at a given shape."""
    from yoloret_tpu.nn import build_detector

    model = build_detector(backbone, num_classes=num_classes)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *input_hw, 3)), False
    )
    fn = jax.jit(lambda v, x: model.apply(v, x, False))
    lowered = fn.lower(variables, jnp.zeros((batch, *input_hw, 3)))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    out = {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    out["params"] = float(n_params)
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (open in XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timeit(fn, *args, iters: int = 20, warmup: int = 3) -> float:
    """Median wall-clock seconds per call (device-synchronized)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def main(argv: Optional[list] = None):
    import argparse

    p = argparse.ArgumentParser(description="detector FLOPs/params profile")
    p.add_argument("--backbone", default="mobilenetv2x75")
    p.add_argument("--input_size", type=int, default=320)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--num_classes", type=int, default=20)
    a = p.parse_args(argv)
    c = cost_analysis(a.backbone, (a.input_size, a.input_size), a.batch, a.num_classes)
    print(
        f"{a.backbone}@{a.input_size} b{a.batch}: "
        f"{c['flops'] / 1e9:.2f} GFLOPs, {c['bytes_accessed'] / 1e6:.1f} MB traffic, "
        f"{c['params'] / 1e6:.2f} M params"
    )


if __name__ == "__main__":
    main()
