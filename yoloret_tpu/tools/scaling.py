"""Multi-chip scaling accounting for the data-parallel programs.

Turns "the step partitions correctly" (dryrun/equality tests) into
"the step scales predictably": for virtual mesh sizes 1/2/4/8 this
module compiles the REAL sharded train step (and the DP serving
program), then reports

  * per-device FLOPs and HBM bytes from XLA's cost model — weak scaling
    means both stay constant as the mesh grows with fixed per-device
    batch;
  * collective traffic per step, read directly from the optimized HLO's
    ``all-reduce`` (+ ``all-gather``/``reduce-scatter``/
    ``collective-permute``) instructions — for pure DP this is the
    gradient all-reduce (= trainable-param bytes) plus the cross-shard
    BatchNorm statistics reductions (sync-BN falls out of the sharding)
    and scalar loss metrics;
  * a projected v5e-8 efficiency: ring all-reduce time
    2*(n-1)/n * bytes / ICI_BW against the measured single-chip step
    time (STATUS.md) — the ``tf.distribute`` semantics the reference
    relies on (reference: code/train.py:48-56) never quantified this.

Run under a virtual mesh (the test suite's topology):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m yoloret_tpu.tools.scaling

Collective bytes are topology-independent program properties (they come
from the SPMD partitioner, not the backend), so the CPU-mesh numbers
transfer to real ICI meshes.
"""

from __future__ import annotations

import argparse
import re
from functools import partial
from typing import Dict, Optional

import numpy as np

# v5e per-chip ICI bandwidth assumption for the projection (2D torus,
# ~45 GB/s per direction per link x 2 links usable for a 1-D ring
# all-reduce). Stated, not measured — no multi-chip hardware here.
V5E_ICI_GBPS = 90.0
# Measured single-chip train step, b128@320 bf16 (STATUS.md round 3,
# honest readback timing): ~2350 img/s -> 54.5 ms/step.
MEASURED_STEP_MS_B128 = 54.5

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "pred": 1, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute")


def hlo_collective_bytes(hlo_text: str) -> Dict[str, int]:
    """Sum output bytes of every collective instruction in optimized HLO.

    Matches shapes like ``f32[1675923]{0}`` or tuple results
    ``(f32[48]{0}, f32[48]{0}) all-reduce(...)``.
    """
    out = {k: 0 for k in _COLLECTIVES}
    shape_re = re.compile(r"(\w+)\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        line = line.strip()
        # instruction lines look like: %name = <shape> op-name(...)
        m = re.match(r"^(?:ROOT\s+)?%?[\w.-]+\s*=\s*(.*)$", line)
        if not m:
            continue
        rhs = m.group(1)
        for op in _COLLECTIVES:
            # op name must be the instruction, not a substring of
            # metadata: it appears as "op(" or "op-start("
            if re.search(rf"\b{op}(?:-start)?\(", rhs):
                # shapes before the op name = the result shape(s)
                head = rhs.split(op)[0]
                shapes = [s for s in shape_re.findall(head)
                          if s[0] in _DTYPE_BYTES]
                # Async "-start" results are a tuple carrying BOTH the
                # operand-alias buffers and the output buffers —
                # (op_1..op_k, out_1..out_k) — so counting every shape
                # would double the bytes.  Keep only the output half.
                # (Sync collectives, which the CPU SPMD partitioner
                # emits, list the outputs alone and are unaffected.)
                if re.search(rf"\b{op}-start\(", rhs):
                    shapes = shapes[len(shapes) // 2:]
                for dt, dims in shapes:
                    n = 1
                    for d in dims.split(","):
                        if d:
                            n *= int(d)
                    out[op] += n * _DTYPE_BYTES[dt]
                break
    return out


def _cost(compiled) -> Dict[str, float]:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return dict(ca)


def build_train_step(n_devices: int, size: int = 64, per_device_batch: int = 1,
                     num_classes: int = 20):
    """The real sharded train step (stage-2 config: all params trainable,
    EMA off) lowered over an n-device data mesh. Returns (jitted, args)."""
    import jax
    import jax.numpy as jnp
    import optax

    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.ops import assign_targets_batch, true_corner_boxes
    from yoloret_tpu.parallel import batch_sharding, make_mesh, replicate
    from yoloret_tpu.train import StepConfig, TrainState, train_step

    anchors = ((10, 13), (16, 30), (33, 23), (30, 61), (62, 45),
               (59, 119), (116, 90), (156, 198), (373, 326))
    mesh = make_mesh(jax.devices()[:n_devices])
    batch = per_device_batch * n_devices
    model = build_detector("mobilenetv2x75", num_classes=num_classes)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    tx = optax.adam(1e-3, eps=1e-8)
    state = TrainState.create(
        model.apply, variables["params"], variables["batch_stats"], tx
    )
    cfg = StepConfig(anchors=anchors, backbone_train=True)

    rng = np.random.RandomState(0)
    boxes = np.zeros((batch, 20, 5), np.float32)
    boxes[:, 0, :4] = [8, 8, 40, 40]
    anchors_np = np.asarray(anchors, np.float32)
    y0, y1, y2 = assign_targets_batch(
        jnp.asarray(boxes), (size, size), anchors_np, num_classes
    )
    gt, valid = true_corner_boxes(jnp.asarray(boxes), (size, size))
    host_batch = {
        "images": rng.rand(batch, size, size, 3).astype(np.float32),
        "y_true_0": y0, "y_true_1": y1, "y_true_2": y2,
        "gt_boxes": gt, "gt_valid": valid,
    }
    data, repl = batch_sharding(mesh), replicate(mesh)
    sharded = jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), data), host_batch)
    state = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, state)
    step = jax.jit(
        partial(train_step, cfg=cfg),
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
    )
    return step, (state, sharded, jax.random.PRNGKey(1)), state


def build_serving(n_devices: int, size: int = 64, per_device_batch: int = 1,
                  num_classes: int = 20):
    """The DP serving program (forward + decode + class-aware NMS)."""
    import jax
    import jax.numpy as jnp

    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.ops import detect_batch
    from yoloret_tpu.parallel import batch_sharding, make_mesh, replicate

    anchors = jnp.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45],
         [59, 119], [116, 90], [156, 198], [373, 326]], jnp.float32)
    mesh = make_mesh(jax.devices()[:n_devices])
    batch = per_device_batch * n_devices
    model = build_detector("mobilenetv2x75", num_classes=num_classes)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32), False
    )
    data, repl = batch_sharding(mesh), replicate(mesh)
    variables = jax.tree.map(lambda a: jax.device_put(a, repl), variables)

    def detect(v, images, image_hw):
        outs = model.apply(v, images, False)
        return detect_batch(
            outs, anchors, num_classes=num_classes, image_hw=image_hw,
            score_threshold=0.0, num_candidates=32,
        )

    det = jax.jit(detect, in_shardings=(repl, data, data), out_shardings=repl)
    images = jax.device_put(
        np.random.RandomState(0).rand(batch, size, size, 3).astype(np.float32),
        data)
    hw = jax.device_put(np.full((batch, 2), float(size), np.float32), data)
    return det, (variables, images, hw)


def analyze(n_devices: int, size: int = 64, per_device_batch: int = 1) -> dict:
    """Compile both DP programs on an n-device mesh; return the scaling
    accounting for one step."""
    import jax

    step, args, state = build_train_step(n_devices, size, per_device_batch)
    lowered = step.lower(*args)
    compiled = lowered.compile()
    cost = _cost(compiled)
    coll = hlo_collective_bytes(compiled.as_text())

    param_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(state.params))

    det, dargs = build_serving(n_devices, size, per_device_batch)
    dcomp = det.lower(*dargs).compile()
    dcoll = hlo_collective_bytes(dcomp.as_text())
    dcost = _cost(dcomp)

    return {
        "n_devices": n_devices,
        "per_device_batch": per_device_batch,
        "train_flops_per_device": cost.get("flops", float("nan")),
        "train_bytes_per_device": cost.get("bytes accessed", float("nan")),
        "train_collective_bytes": coll,
        "param_bytes": param_bytes,
        "serve_flops_per_device": dcost.get("flops", float("nan")),
        "serve_collective_bytes": dcoll,
    }


def ring_allreduce_ms(bytes_: float, n: int, gbps: float = V5E_ICI_GBPS) -> float:
    """Bandwidth-term ring all-reduce time: each chip moves
    2*(n-1)/n * bytes over its ICI links."""
    if n <= 1:
        return 0.0
    return 2.0 * (n - 1) / n * bytes_ / (gbps * 1e9) * 1e3


def project_v5e8(collective_bytes: float,
                 step_ms: float = MEASURED_STEP_MS_B128,
                 n: int = 8) -> dict:
    """Projected 8-chip DP efficiency with the measured single-chip step
    (assumes per-chip batch stays b128 — weak scaling — and compute/
    comm NOT overlapped: a worst-case bound; XLA typically overlaps the
    grad all-reduce with the tail of the backward pass)."""
    ar_ms = ring_allreduce_ms(collective_bytes, n)
    eff = step_ms / (step_ms + ar_ms)
    return {"allreduce_ms": ar_ms, "step_ms": step_ms,
            "efficiency_lower_bound": eff,
            "projected_img_per_s": n * 128 / (step_ms + ar_ms) * 1e3}


# Measured single-chip serving call, b128@320 uint8 pipeline
# (STATUS.md round 4: 8.2 ms chip-side latency per b128 call).
MEASURED_SERVE_MS_B128 = 8.2
# Per-hop ICI message latency assumption for the latency-path
# projection (order-1 us on v4/v5e class interconnects; stated, not
# measured — no multi-chip hardware here).
V5E_ICI_HOP_US = 1.0


def project_serving_latency(collective_bytes: float,
                            chip_ms: float = MEASURED_SERVE_MS_B128,
                            n: int = 8) -> dict:
    """Projected mesh-n per-REQUEST latency cost of the DP serving
    all-gather (it sits on the critical path of every request, unlike
    the train all-reduce which overlaps the backward pass): ring
    all-gather bandwidth term (n-1)/n * bytes / ICI_BW plus (n-1)
    per-hop latencies.  ``collective_bytes`` is the program-total
    gathered result size."""
    if n <= 1:
        ag_ms = 0.0
    else:
        ag_ms = ((n - 1) / n * collective_bytes / (V5E_ICI_GBPS * 1e9)
                 + (n - 1) * V5E_ICI_HOP_US * 1e-6) * 1e3
    return {"allgather_ms": ag_ms, "chip_ms": chip_ms,
            "latency_overhead_pct": 100.0 * ag_ms / chip_ms}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--input", type=int, default=64)
    a = p.parse_args(argv)

    rows = []
    for n in a.sizes:
        r = analyze(n, size=a.input)
        rows.append(r)
        total = sum(r["train_collective_bytes"].values())
        print(f"mesh={n}: train flops/dev={r['train_flops_per_device']:.3e} "
              f"bytes/dev={r['train_bytes_per_device']:.3e} "
              f"collectives={total / 1e6:.2f} MB "
              f"(param bytes {r['param_bytes'] / 1e6:.2f} MB) "
              f"serve collectives={sum(r['serve_collective_bytes'].values())} B",
              flush=True)

    last = rows[-1]
    total = sum(last["train_collective_bytes"].values())
    proj = project_v5e8(total)
    print("\nProjected v5e-8 DP train efficiency (ring all-reduce, "
          f"{V5E_ICI_GBPS:.0f} GB/s ICI, no overlap — lower bound):")
    print(f"  all-reduce {proj['allreduce_ms']:.3f} ms vs step "
          f"{proj['step_ms']:.1f} ms -> efficiency >= "
          f"{proj['efficiency_lower_bound'] * 100:.2f}%, projected "
          f"{proj['projected_img_per_s']:.0f} img/s at 8x b128")

    serve_total = sum(last["serve_collective_bytes"].values())
    sproj = project_serving_latency(serve_total)
    print(f"\nProjected mesh-8 serving latency cost (result all-gather "
          f"on the request critical path, {V5E_ICI_HOP_US:.0f} us/hop):")
    print(f"  all-gather {sproj['allgather_ms'] * 1e3:.1f} us vs chip "
          f"{sproj['chip_ms']:.1f} ms/call -> "
          f"+{sproj['latency_overhead_pct']:.3f}% per-request latency")
    return rows


if __name__ == "__main__":
    main()
