"""Why do some batch sizes emit visibly worse XLA-TPU programs?

Round 3's batch sweep measured b64 10.9k / b128 15.6k / b192 10.8k /
b256 14.4k img/s on the u8 serving pipeline, with cost_analysis bytes
jumping from 45.6 MB/img (b128) to 61-75 MB/img at the bad sizes —
i.e. XLA emits a structurally different (byte-heavier) program per
batch size. This COMPILE-ONLY study localizes the blowup without
spending TPU runtime: for each batch size and stage (model conv stack
vs full pipeline) it records

  * cost_analysis FLOPs + bytes accessed per image,
  * memory_analysis temp/argument/output allocation sizes,
  * the optimized-HLO op mix: counts and logical byte totals of copy /
    transpose / reshape / convolution / fusion instructions (explicit
    copies and transposes are the signature of layout-assignment
    changes).

    nohup python -m yoloret_tpu.tools.batch_layout_study > /tmp/layout.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import re
import sys

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch
from yoloret_tpu.tools.roofline import ANCHORS

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "f32": 4, "s32": 4, "u32": 4,
                "f64": 8, "s64": 8, "u64": 8}

# "bf16[128,40,40,144]" -> logical bytes
_SHAPE_RE = re.compile(r"\b(pred|s8|u8|s16|u16|bf16|f16|f32|s32|u32|f64|s64|u64)\[([0-9,]*)\]")


def _shape_bytes(m: re.Match) -> int:
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def _op_mix(hlo: str) -> dict:
    """Count instructions and their OUTPUT logical bytes per op class.

    Parses optimized-HLO instruction lines of the form
    ``  %name = bf16[...] opcode(...)`` / ``  name.1 = f32[...] fusion(...)``.
    """
    mix: dict = {}
    line_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?[\w.-]+ = ([a-z0-9]+)\[([0-9,]*)\][^ ]* ([a-z-]+)\(")
    for line in hlo.splitlines():
        m = line_re.match(line)
        if not m:
            continue
        dt, dims, op = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        rec = mix.setdefault(op, [0, 0])
        rec[0] += 1
        rec[1] += n * _DTYPE_BYTES[dt]
    return {k: {"count": v[0], "mb": round(v[1] / 1e6, 1)}
            for k, v in sorted(mix.items(), key=lambda kv: -kv[1][1])}


def study(batch: int, stage: str, model, variables, anchors, size: int,
          num_classes: int, top_ops: int = 8) -> dict:
    image_hw = jnp.full((batch, 2), float(size), jnp.float32)

    def fwd(x, v):
        x = x.astype(jnp.float32) * (1.0 / 255.0)
        return model.apply(v, x, False)

    def pipeline(x, v):
        return detect_batch(
            fwd(x, v), anchors, num_classes=num_classes, image_hw=image_hw,
            score_threshold=0.3, num_candidates=64)

    fn = fwd if stage == "model" else pipeline
    imgs = jnp.zeros((batch, size, size, 3), jnp.uint8)
    compiled = jax.jit(fn).lower(imgs, variables).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    rec = dict(
        batch=batch, stage=stage,
        flops_per_img=round(float(c.get("flops", 0.0)) / batch / 1e9, 3),
        mb_per_img=round(float(c.get("bytes accessed", 0.0)) / batch / 1e6, 1),
    )
    try:
        ma = compiled.memory_analysis()
        rec.update(
            temp_mb=round(ma.temp_size_in_bytes / 1e6, 1),
            output_mb=round(ma.output_size_in_bytes / 1e6, 1),
        )
    except Exception:
        pass
    try:
        mix = _op_mix(compiled.as_text())
        rec["op_mix_top"] = dict(list(mix.items())[:top_ops])
    except Exception as e:
        rec["op_mix_error"] = repr(e)[:120]
    return rec


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batches", default="64,96,128,192,256")
    p.add_argument("--stages", default="model,pipeline")
    p.add_argument("--size", type=int, default=320)
    p.add_argument("--backbone", default="mobilenetv2x75")
    a = p.parse_args()

    model = build_detector(a.backbone, num_classes=20, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, a.size, a.size, 3)), False)
    anchors = jnp.asarray(np.asarray(ANCHORS))
    for batch in (int(b) for b in a.batches.split(",")):
        for stage in a.stages.split(","):
            print(f"b{batch}/{stage}: compiling...", file=sys.stderr, flush=True)
            try:
                rec = study(batch, stage, model, variables, anchors,
                            a.size, 20)
                print(json.dumps(rec), flush=True)
            except Exception as e:
                print(json.dumps({"batch": batch, "stage": stage,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
