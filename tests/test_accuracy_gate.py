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
    from yoloret_tpu.configs import RunConfig
    from yoloret_tpu.data import Dataset, DatasetMode, load_anchors
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.tools.topk_study import CLASS_NAMES, build_crowded
    from yoloret_tpu.train.trainer import train

    size, batch, epochs = 160, 8, 40
    ann, classes, anchors_path = build_crowded(str(tmp_path))
    cfg = RunConfig(
        backbone="mobilenetv2x75",
        input_size=(size, size),
        train_dataset=ann,
        classes_path=classes,
        anchors_path=anchors_path,
        batch_size=batch,
        epochs=(epochs, epochs),
        learning_rate=(2e-3, 2e-3),
        freeze=False,
        max_boxes=12,
        bf16=False,
        mesh_data=1,
        checkpoint_every=10**9,
        log_dir=str(tmp_path / "logs"),
        seed=0,
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
    print(f"crowded-synthetic mAP @40 epochs: {mAP:.4f} "
          f"(per-class {[round(a, 3) for a in aps.values()]})")
    # Band calibrated in round 3 on this recipe: 0.9135 measured.
    # Anything below the floor means a silent accuracy regression;
    # a jump above the ceiling means the recipe changed (recalibrate).
    assert 0.80 <= mAP <= 1.0, f"mAP {mAP:.4f} left the calibrated band"
    assert all(np.isfinite(list(aps.values())))
