"""Benchmark harness — run on real TPU hardware by the driver.

Measures steady-state inference throughput of the flagship config
(YOLO-ReT MobileNetV2x0.75 @ 320x320, bf16 compute, on-device decode +
class-aware NMS) and prints ONE JSON line. Baseline: 1e4 images/sec on
a v5e-8 at 320x320 (BASELINE.md) -> 1250 images/sec/chip; vs_baseline
is measured per-chip throughput over that.

Serving runs the fully-fused program with ``inner`` chained in-program
repeats (default 8: amortizes the tunnel's ~1-2 ms per-execution
dispatch floor, which a production host overlaps — the chip-true
number). MAP-grade runs the two-program split (model+candidates /
suppression; dodges the XLA-TPU compile cliff, tools/compile_split.py)
with the SAME ``inner`` amortization (round 5): ``inner`` chained
candidate batches per stage-A program, one stage-B program suppressing
all of them — rounds 3-4 dispatched one unamortized pair per batch,
which put two tunnel dispatch floors on every 9.5 ms pair and made the
driver number tunnel-load-sensitive (13,914 r3 vs 13,527 r4).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax

# Persistent compile cache: the fused forward+decode+NMS program is large
# and first-compile on the tunneled backend is minutes; cache hits are
# seconds on reruns.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch

ANCHORS = np.asarray(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
     [59, 119], [116, 90], [156, 198], [373, 326]],
    np.float32,
)
BASELINE_PER_CHIP = 1250.0  # images/sec/chip (1e4 on v5e-8)


def main(batch: int = 128, size: int = 320, iters: int = 50, warmup: int = 5,
         inner: int = 8):
    # batch 128 + uint8 input: the measured round-3 sweet spot
    # (tools/bench_batch.py: 15.6k img/s vs 13.2k at b256/f32) AND
    # production parity — the Predictor and the data pipeline transfer
    # uint8 and normalize on device.
    n_chips = max(1, len(jax.devices()))
    model = build_detector("mobilenetv2x75", num_classes=20, dtype=jnp.bfloat16,
                           head_dtype=None)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    anchors = jnp.asarray(ANCHORS)
    image_hw = jnp.full((batch, 2), float(size), jnp.float32)

    def make_infer(thresh, pool_depth):
        def body(variables, images):
            x = images.astype(jnp.float32) * (1.0 / 255.0)
            outs = model.apply(variables, x, False)
            # Shared-candidate-pool postprocess (ops/postprocess.py::
            # _detect_batch_shared_pool): one top-M over positions +
            # per-position box decode, measured 13.4k img/s/chip at the
            # serving config and 11.6k at MAP grade vs 8.8k / 5.2k for
            # the round-1 per-class structure (tools/bench_sweep.py).
            res = detect_batch(
                outs, anchors, num_classes=20, image_hw=image_hw,
                score_threshold=thresh, num_candidates=pool_depth,
                pool="shared",
            )
            # Feed a scalar of the result back into the next input so each
            # iteration depends on the previous one — otherwise an async /
            # tunneled backend can overlap independent executions and the
            # loop measures dispatch rate, not device throughput. The
            # epsilon is cast BEFORE the add so uint8 images stay uint8
            # (0 added) instead of promoting the whole loop to f32.
            return images + (1e-12 * jnp.mean(res.scores)).astype(images.dtype)

        @jax.jit
        def infer(variables, images):
            if inner == 1:
                return body(variables, images)
            # ``inner`` chained steps inside ONE program: divides the
            # backend's fixed per-execution dispatch overhead (~2-3 ms
            # through the tunnel, tools/roofline.py) by ``inner``. A
            # production host overlaps that dispatch with execution, so
            # the amortized number is the chip-true one.
            return jax.lax.fori_loop(
                0, inner, lambda i, im: body(variables, im), images)

        return infer

    rng = np.random.RandomState(0)

    # Host-readback completion probe: on the tunneled (axon) backend
    # jax.block_until_ready does NOT reliably wait for execution (round-3
    # finding: block-based timing measured 5x the chip's peak FLOP/s);
    # reading one derived scalar back to the host is ground truth. The
    # chained loop makes the final images depend on every iteration.
    @jax.jit
    def probe(im):
        return jnp.sum(im[0, 0, 0].astype(jnp.float32))

    def sync(images):
        return float(np.asarray(probe(images)))

    def run_config(name, thresh, pool_depth):
        infer = make_infer(thresh, pool_depth)
        images = jnp.asarray(
            rng.randint(0, 256, (batch, size, size, 3), np.uint8))
        t_c = time.perf_counter()
        for _ in range(warmup):
            images = infer(variables, images)
        sync(images)  # also warms the probe program
        compile_s = time.perf_counter() - t_c
        # compile-time creep watch (VERDICT r2 weak #6): machine-readable
        # per-config compile+warmup seconds on stderr
        print(json.dumps({"compile_config": name, "inner": inner,
                          "compile_warmup_s": round(compile_s, 1)}),
              file=sys.stderr)
        t0 = time.perf_counter()
        for _ in range(iters):
            images = infer(variables, images)
        sync(images)
        dt = time.perf_counter() - t0
        return batch * iters * inner / dt / n_chips

    def run_config_split(name, thresh, pool_depth):
        # Two-program MAP-grade path (eval/map.py does the same): the
        # FUSED b128/M512 program hits the XLA-TPU backend-pass compile
        # cliff (330-920 s server-side); jitting (model+candidates) and
        # (suppression) separately compiles in seconds and measured
        # FASTER end to end (tools/compile_split.py).
        #
        # Rounds 3-4 dispatched ONE a->b pair per iteration, so every
        # pair paid the tunnel's ~1-2 ms per-execution dispatch floor
        # twice and the driver number wobbled with tunnel load (13,914
        # r3 -> 13,527 r4 = 2.8%, well inside one dispatch gap per
        # 9.5 ms pair). Round 5 amortizes it the same way the serving
        # config does: ``inner`` chained candidate batches inside ONE
        # stage-A program (lax.scan), their pools suppressed by ONE
        # stage-B program — the per-execution floor divides by
        # ``inner``, and the two programs form independent dependency
        # chains (A chains on A, B accumulates) so consecutive pairs
        # overlap like production eval's chunk pipeline. Every
        # execution stays on the final readback's dependency path.
        from yoloret_tpu.ops import shared_pool_candidates, shared_pool_suppress

        @jax.jit
        def stage_a(variables, images, fa):
            def one(im, _):
                x = im.astype(jnp.float32) * (1.0 / 255.0)
                outs = model.apply(variables, x, False)
                boxes, scores = shared_pool_candidates(
                    outs, anchors, 20, image_hw, num_candidates=pool_depth)
                im = im + (1e-12 * jnp.mean(boxes)).astype(im.dtype)
                return im, (boxes, scores)
            im0 = images + fa.astype(images.dtype)
            _, (bs, ss) = jax.lax.scan(one, im0, None, length=inner)
            fa_next = (1e-12 * jnp.mean(bs[-1])).astype(jnp.float32)
            return bs, ss, fa_next

        @jax.jit
        def stage_b(bs, ss, acc):
            def one(a, xs):
                res = shared_pool_suppress(*xs, score_threshold=thresh)
                return a + (1e-12 * jnp.mean(res.scores)), None
            acc, _ = jax.lax.scan(one, acc, (bs, ss))
            return acc

        images = jnp.asarray(
            rng.randint(0, 256, (batch, size, size, 3), np.uint8))
        fa = jnp.zeros((), jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        t_c = time.perf_counter()
        for _ in range(warmup):
            bs, ss, fa = stage_a(variables, images, fa)
            acc = stage_b(bs, ss, acc)
        float(np.asarray(acc))
        print(json.dumps({"compile_config": name, "split": True,
                          "inner": inner,
                          "compile_warmup_s":
                              round(time.perf_counter() - t_c, 1)}),
              file=sys.stderr)
        laps = []
        t0 = time.perf_counter()
        for _ in range(iters):
            t_i = time.perf_counter()
            bs, ss, fa = stage_a(variables, images, fa)
            acc = stage_b(bs, ss, acc)
            laps.append(time.perf_counter() - t_i)
        float(np.asarray(acc))
        float(np.asarray(fa))
        dt = time.perf_counter() - t0
        # dispatch-time spread (NOT execution time — the backend queues
        # ahead; the total is bounded by the readback above): a noisy
        # tail here fingers the tunnel, not the chip.
        laps_ms = sorted(1e3 * t for t in laps)
        print(json.dumps({
            "split_spread": name,
            "dispatch_ms_p50": round(laps_ms[len(laps_ms) // 2], 2),
            "dispatch_ms_max": round(laps_ms[-1], 2),
        }), file=sys.stderr)
        return batch * iters * inner / dt / n_chips

    # MAP-grade config first (threshold 0, 512-deep shared pool — the
    # mAP evaluator's measured-lossless default, tools/topk_study.py);
    # reported to stderr per the one-JSON-line contract.
    map_ips = run_config_split("map_grade", 0.0, 512)
    print(
        json.dumps({
            "metric": "inference_images_per_sec_per_chip_320_map_grade",
            "value": round(map_ips, 1),
            "unit": "images/sec/chip",
            "vs_baseline": round(map_ips / BASELINE_PER_CHIP, 3),
        }),
        file=sys.stderr,
    )
    # Serving config (threshold 0.3, 64-deep pool) — the headline metric.
    ips_per_chip = run_config("serving", 0.3, 64)
    print(
        json.dumps(
            {
                "metric": "inference_images_per_sec_per_chip_320",
                "value": round(ips_per_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips_per_chip / BASELINE_PER_CHIP, 3),
            }
        )
    )


def main_train(batch: int = 128, size: int = 320, iters: int = 20, warmup: int = 3,
               remat: bool = False):
    """Training-step throughput (not the driver metric; run with --train;
    ``--remat`` benches the activation-rematerialized step)."""
    import optax

    from yoloret_tpu.ops import assign_targets_batch, true_corner_boxes
    from yoloret_tpu.train import StepConfig, TrainState, train_step
    from functools import partial

    model = build_detector("mobilenetv2x75", num_classes=20,
                           dtype=jnp.bfloat16, remat=remat)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    tx = optax.adam(1e-3, eps=1e-8)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    cfg = StepConfig(anchors=tuple(map(tuple, ANCHORS.tolist())))

    rng = np.random.RandomState(0)
    boxes = np.zeros((batch, 20, 5), np.float32)
    boxes[:, 0, :4] = [20, 20, 120, 120]
    y0, y1, y2 = assign_targets_batch(
        jnp.asarray(boxes), (size, size), jnp.asarray(ANCHORS), 20
    )
    gt, valid = true_corner_boxes(jnp.asarray(boxes), (size, size))
    b = {
        "images": jnp.asarray(rng.rand(batch, size, size, 3).astype(np.float32)),
        "y_true_0": y0, "y_true_1": y1, "y_true_2": y2,
        "gt_boxes": gt, "gt_valid": valid,
    }
    step = jax.jit(partial(train_step, cfg=cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    t_c = time.perf_counter()
    compiled = step.lower(state, b, key).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    flops = float(c.get("flops", 0.0)) / batch
    bytes_ = float(c.get("bytes accessed", 0.0)) / batch
    for _ in range(warmup):
        state, m = compiled(state, b, key)
    float(np.asarray(m["loss"]))  # host readback = true completion (see main)
    compile_s = time.perf_counter() - t_c
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = compiled(state, b, key)  # state donation chains iterations
    float(np.asarray(m["loss"]))  # waits for the whole chain via state deps
    dt = time.perf_counter() - t0
    ips = batch * iters / dt / max(1, len(jax.devices()))
    from yoloret_tpu.tools.roofline import chip_peaks
    _, peak_flops, peak_bw = chip_peaks()
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_320",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": None,
        "batch": batch,
        "gflop_per_img": round(flops / 1e9, 3),
        "mb_per_img": round(bytes_ / 1e6, 1),
        "pct_compute_peak": round(100.0 * flops * ips / peak_flops, 1),
        "pct_bw_peak": round(100.0 * bytes_ * ips / peak_bw, 1),
        "compile_s": round(compile_s, 1),
        "remat": remat,
    }))


if __name__ == "__main__":
    kw = {}
    if "--batch" in sys.argv:
        kw["batch"] = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--train" in sys.argv:
        if "--remat" in sys.argv:
            kw["remat"] = True
        main_train(**kw)
    else:
        if "--inner" in sys.argv:
            kw["inner"] = int(sys.argv[sys.argv.index("--inner") + 1])
        main(**kw)
