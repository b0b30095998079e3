"""Accuracy-regression gate runner: train the crowded-synthetic recipe
and print the resulting mAP as one JSON line.

This is the executable half of ``tests/test_accuracy_gate.py``. The test
runs it IN A SUBPROCESS with a pinned environment (single-device CPU,
no ``--xla_force_host_platform_device_count``) because the training
numerics — not the data stream — depend on the XLA CPU device topology:
the same recipe reaches epoch-0 loss 1279.507080 on one CPU device but
1280.260620 under the test suite's 8-virtual-device flag (different
reduction tiling → different fp accumulation order), and 60 epochs of
partial convergence amplify that 6e-4 perturbation chaotically (mAP
0.3138 vs 0.1445 measured on the two topologies, round 3). The host
pipeline itself is bitwise deterministic either way
(tests/test_pipeline_determinism.py); pinning the device topology makes
the whole run bitwise reproducible, so the gate band can be meaningful.

    python -m yoloret_tpu.tools.accuracy_gate [--workdir DIR]

Recipe: tools/topk_study.py::crowded_train_cfg (seed 0, 60 epochs,
mild augment — the shared partial-convergence study recipe). Eval is
``--mode=MAP`` grade (reference: code/yolo.py:397-405): threshold 0,
default shared-pool postprocess.
"""

from __future__ import annotations

import argparse
import json
import tempfile


def run(workdir: str | None = None, epochs: int = 60, size: int = 160,
        batch: int = 8) -> dict:
    import numpy as np

    from yoloret_tpu.data import Dataset, DatasetMode, load_anchors
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.tools.topk_study import (
        CLASS_NAMES,
        build_crowded,
        crowded_train_cfg,
    )
    from yoloret_tpu.train.trainer import train

    workdir = workdir or tempfile.mkdtemp(prefix="yoloret_gate_")
    ann, classes, anchors_path = build_crowded(workdir)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors_path,
                            epochs=epochs, size=size, batch=batch)
    weights = train(cfg)

    anchors = load_anchors(anchors_path)
    pred = Predictor(
        backbone="mobilenetv2x75", weights=weights,
        class_names=CLASS_NAMES, anchors=anchors,
        input_hw=(size, size), score_threshold=0.0, bf16=False,
    )
    ds = Dataset(
        ann, batch_size=batch, anchors=anchors,
        num_classes=len(CLASS_NAMES), input_hw=(size, size),
        mode=DatasetMode.TEST, max_boxes=12,
    )
    mAP, aps = evaluate_map(
        pred.model, pred.variables, ds, anchors, CLASS_NAMES, verbose=False
    )
    result = {
        "mAP": round(float(mAP), 6),
        "aps": {int(k): round(float(v), 6) for k, v in aps.items()},
        "epochs": epochs,
    }
    print("GATE_RESULT " + json.dumps(result), flush=True)
    return result


def run_loss_trace(workdir: str | None = None, epochs: int = 3,
                   size: int = 160, batch: int = 8) -> dict:
    """The FAST tight gate: train the same recipe for a few epochs and
    print the per-epoch mean loss trace. On the pinned topology this is
    reproducible to float-rounding, so the companion test
    (tests/test_accuracy_gate.py::test_loss_trace_pinned) asserts it to
    rtol 1e-6 — catching real numerics regressions the wide 60-epoch mAP
    band cannot (that band is ±0.09 wide because partial convergence
    amplifies perturbations chaotically; the 3-epoch trace has no such
    amplification). NB: epochs is part of the recipe — the cosine LR
    schedule spans it."""
    import json as _json
    import os

    from yoloret_tpu.tools.topk_study import build_crowded, crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    workdir = workdir or tempfile.mkdtemp(prefix="yoloret_losstrace_")
    ann, classes, anchors_path = build_crowded(workdir)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors_path,
                            epochs=epochs, size=size, batch=batch)
    train(cfg)
    metrics_path = os.path.join(
        cfg.log_dir, f"{cfg.backbone}_stage2", "metrics.jsonl")
    losses = [
        rec["loss"] for rec in map(_json.loads, open(metrics_path))
        if "loss" in rec
    ]
    # The trainer appends to metrics.jsonl: a reused --workdir carries
    # records from prior runs, so keep only this run's tail.
    losses = losses[-epochs:]
    result = {"losses": losses, "epochs": epochs}
    print("GATE_LOSS_TRACE " + _json.dumps(result), flush=True)
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default=None)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--loss_trace", action="store_true",
                   help="fast tight gate: N-epoch loss trace instead of "
                        "the full 60-epoch mAP run")
    a = p.parse_args(argv)
    if a.loss_trace:
        run_loss_trace(workdir=a.workdir, epochs=a.epochs, size=a.size,
                       batch=a.batch)
    else:
        run(workdir=a.workdir, epochs=a.epochs, size=a.size, batch=a.batch)


if __name__ == "__main__":
    main()
