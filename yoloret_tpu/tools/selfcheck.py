"""End-to-end learning self-check.

Trains the flagship detector on a tiny synthetic dataset (bright
rectangles on dark background, deterministic) through the REAL
trainer + data pipeline, then evaluates VOC mAP with the real
evaluator. A healthy build overfits to mAP ~1.0; anything below the
threshold means a wiring/numerics regression somewhere between the
pipeline, loss, and postprocess.

    python -m yoloret_tpu.tools.selfcheck [--epochs 30] [--size 96]
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np


def build_synthetic(root: str, n: int = 48, hw=(120, 160), seed: int = 0,
                    objects: int = 3):
    """n images with `objects` colored rectangles each. Sized by
    measurement: single-object 16-image data plateaus at mAP ~0.02 even
    at 300 steps (too little positive signal against the ~1/567
    objectness prior); 48 images x 3 objects reaches mAP 0.63 by 360
    steps and ~1.0 by the 150-epoch default."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    lines = []
    for i in range(n):
        h, w = hw
        arr = np.full((h, w, 3), 24, np.uint8)
        boxes = []
        for k in range(objects):
            bw = int(rng.randint(40, 70))
            bh = int(rng.randint(30, 60))
            x = int(rng.randint(0, w - bw))
            y = int(rng.randint(0, h - bh))
            c = (i + k) % 2
            arr[y : y + bh, x : x + bw] = [(230, 40, 40), (40, 230, 40)][c]
            boxes.append(f"{x},{y},{x + bw},{y + bh},{c}")
        p = os.path.join(root, f"img{i}.jpg")
        Image.fromarray(arr).save(p, quality=95)
        lines.append(p + " " + " ".join(boxes))
    ann = os.path.join(root, f"synth_train_{n}.txt")
    with open(ann, "w") as f:
        f.write("\n".join(lines) + "\n")
    classes = os.path.join(root, "classes.txt")
    with open(classes, "w") as f:
        f.write("red\ngreen\n")
    anchors = os.path.join(root, "anchors.txt")
    with open(anchors, "w") as f:
        f.write("10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326\n")
    return ann, classes, anchors


def run(epochs: int = 30, size: int = 96, batch: int = 8, threshold: float = 0.8,
        workdir: str | None = None) -> float:
    from yoloret_tpu.configs import RunConfig
    from yoloret_tpu.data import Dataset, DatasetMode, load_anchors
    from yoloret_tpu.eval import evaluate_map
    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.train.trainer import train

    workdir = workdir or tempfile.mkdtemp(prefix="yoloret_selfcheck_")
    ann, classes, anchors_path = build_synthetic(workdir)
    cfg = RunConfig(
        backbone="mobilenetv2x75",
        input_size=(size, size),
        train_dataset=ann,
        classes_path=classes,
        anchors_path=anchors_path,
        batch_size=batch,
        epochs=(epochs, epochs),
        learning_rate=(2e-3, 2e-3),  # stage-2 lr applies (freeze=False)
        freeze=False,  # train everything: random init, no ImageNet here
        # Gentle augmentation: the synthetic classes are COLORS, so the
        # reference's hue +-0.5 would swap the labels; objectness also
        # needs hundreds of steps at this scale, so keep geometry mild.
        augment={"hue": 0.0, "sat": 0.2, "jitter": 0.1,
                 "min_scale": 0.8, "max_scale": 1.2,
                 "min_gamma": 0.9, "max_gamma": 1.2},
        bf16=False,
        mesh_data=1,
        checkpoint_every=0 or 10**9,  # no periodic ckpt in the self-check
        log_dir=os.path.join(workdir, "logs"),
        train_unfreeze=None,
        seed=0,
    )
    # stage-2 path without a warm start: allow missing train_unfreeze
    weights = train(cfg)

    anchors = load_anchors(anchors_path)
    pred = Predictor(
        backbone="mobilenetv2x75", weights=weights,
        class_names=["red", "green"], anchors=anchors,
        input_hw=(size, size), score_threshold=0.0, bf16=False,
    )
    ds = Dataset(
        ann, batch_size=batch, anchors=anchors, num_classes=2,
        input_hw=(size, size), mode=DatasetMode.TEST,
    )
    mAP, aps = evaluate_map(
        pred.model, pred.variables, ds, anchors, ["red", "green"], verbose=True
    )
    status = "PASS" if mAP >= threshold else "FAIL"
    print(f"selfcheck {status}: mAP={mAP:.3f} (threshold {threshold})")
    return mAP


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--size", type=int, default=96)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--threshold", type=float, default=0.8)
    a = p.parse_args(argv)
    mAP = run(a.epochs, a.size, a.batch, a.threshold)
    raise SystemExit(0 if mAP >= a.threshold else 1)


if __name__ == "__main__":
    main()
