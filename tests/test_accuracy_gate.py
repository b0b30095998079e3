"""Accuracy-regression gate (opt-in: ``pytest -m slow``).

Pins the end-to-end training + eval recipe to a measured mAP band on the
crowded 4-class synthetic (fixed seed, fixed epochs), so perf work on
the model/postprocess/data paths cannot silently trade accuracy — the
reference's only QA was eyeballing ``--mode=MAP`` (yolo.py:397-405).

The expected band was calibrated on this container's CPU backend (see
STATUS.md): identical seeds reproduce identical streams (the pipeline
is deterministic, tests/test_pipeline_determinism.py), so drift outside
the band means a code change altered the math, not noise.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_crowded_synthetic_map_band(tmp_path):
    from yoloret_tpu.data import Dataset, DatasetMode, load_anchors
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.tools.topk_study import (
        CLASS_NAMES,
        build_crowded,
        crowded_train_cfg,
    )
    from yoloret_tpu.train.trainer import train

    size, batch, epochs = 160, 8, 60
    ann, classes, anchors_path = build_crowded(str(tmp_path))
    cfg = crowded_train_cfg(
        str(tmp_path), ann, classes, anchors_path,
        epochs=epochs, size=size, batch=batch,
    )
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
    print(f"crowded-synthetic mAP @60 epochs: {mAP:.4f} "
          f"(per-class {[round(a, 3) for a in aps.values()]})")
    # Band calibrated in round 3: this exact recipe (seed 0, 60 epochs,
    # mild augment) measured mAP 0.3138 on the CPU backend — partial
    # convergence BY DESIGN (a fully-overfit model is insensitive to
    # pipeline regressions). The pipeline is deterministic per backend,
    # so the generous +/- band only absorbs jax/XLA version drift.
    # Below the floor = a silent accuracy regression; above the ceiling
    # = the recipe changed (recalibrate, don't widen).
    assert 0.22 <= mAP <= 0.45, f"mAP {mAP:.4f} left the calibrated band"
    assert all(np.isfinite(list(aps.values())))
