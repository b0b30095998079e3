"""Full-int8 TFLite accuracy study: measure the mAP cost of calibrated
integer quantization against the f32 pipeline.

The reference ships a weight-only TFLite export and an inert
``--quantize`` flag (reference: code/yolo.py:386-394); the edge
deployments the paper targets run full-int8 with activation
calibration. This study trains the crowded synthetic task to partial
convergence (same recipe as tools/topk_study.py — a fully-overfit model
is insensitive and the study would say nothing), exports

  * f32 TFLite (dynamic-range weight compression, reference parity)
  * full-int8 TFLite (representative-dataset calibration)

and scores the backends (JAX f32 oracle, the on-TPU W8A8 path from
nn/int8_infer.py, and both TFLite flavors) with the same VOC-2010
evaluator over the training scenes.

    python -m yoloret_tpu.tools.int8_study [--epochs 40] [--size 160]

Output: a markdown mAP table; paste into docs/usage.md when numbers
move.
"""

from __future__ import annotations

import argparse
import os
import tempfile

import numpy as np

from yoloret_tpu.tools.topk_study import CLASS_NAMES, build_crowded


def _interp_outputs(interp, images, hw=None):
    for d in interp.get_input_details():
        interp.set_tensor(d["index"], images if d["shape"][-1] == 3 else hw)
    interp.invoke()
    return {
        (str(o["dtype"].__name__), tuple(o["shape"][1:])):
            interp.get_tensor(o["index"])
        for o in interp.get_output_details()
    }


def run(epochs: int = 60, size: int = 160, batch: int = 8,
        workdir: str | None = None, max_boxes: int = 12):
    import tensorflow as tf

    from yoloret_tpu.data import load_anchors
    from yoloret_tpu.data.annotations import parse_annotation_line
    from yoloret_tpu.eval.map import MAPEvaluator
    from yoloret_tpu.export.export import _build_infer, export_tf_flavor
    from yoloret_tpu.ops.letterbox import letterbox_numpy_u8
    from yoloret_tpu.tools.topk_study import crowded_train_cfg
    from yoloret_tpu.train.trainer import train

    workdir = workdir or tempfile.mkdtemp(prefix="yoloret_int8_study_")
    ann, classes, anchors_path = build_crowded(workdir)
    cfg = crowded_train_cfg(workdir, ann, classes, anchors_path,
                            epochs=epochs, size=size, batch=batch,
                            max_boxes=max_boxes)
    weights = os.path.join(
        cfg.log_dir, "mobilenetv2x75_stage2",
        "mobilenetv2x75_trained_weights_final",
    )
    if not os.path.isdir(weights):
        weights = train(cfg)

    # MAP-grade threshold: at partial convergence most true detections
    # score low, and a 0.05 cut was measured to collapse AP 0.31 -> 0.04
    # while changing nothing about the int8-vs-f32 comparison
    ecfg = cfg.replace(model=weights, score_threshold=0.0, test_dataset=ann)
    f32_dir = export_tf_flavor(ecfg, os.path.join(workdir, "f32"), "tflite")
    int8_dir = export_tf_flavor(
        ecfg.replace(quantize=True, quantize_samples=16),
        os.path.join(workdir, "int8"), "tflite",
    )

    # ground truth + letterboxed inputs
    from PIL import Image

    samples = []
    with open(ann) as fh:
        for line in fh:
            if line.strip():
                path, boxes = parse_annotation_line(line)
                arr = np.asarray(Image.open(path).convert("RGB"), np.uint8)
                samples.append((arr, boxes))

    import jax.numpy as jnp

    from yoloret_tpu.ops import detect_batch

    infer_jax, _ = _build_infer(ecfg)
    anchors = load_anchors(anchors_path)
    anchors_j = jnp.asarray(anchors, jnp.float32)
    nc = len(CLASS_NAMES)
    grids = [(size // s, size // s) for s in (32, 16, 8)]
    backends = {}

    # on-TPU W8A8 path (nn/int8_infer.py): same trained weights, same
    # 16-image calibration budget as the TFLite converter gets
    import jax as _jax

    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.nn.int8_infer import int8_detector_apply, quantize_from_data
    from yoloret_tpu.utils.checkpoint import load_params

    model = build_detector(ecfg.backbone, num_classes=nc, dtype=jnp.float32)
    variables = model.init(
        _jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), False)
    variables = load_params(weights, like=variables)
    calib = np.stack([
        letterbox_numpy_u8(arr, (size, size)).astype(np.float32) / 255.0
        for arr, _ in samples[:16]
    ])
    qp = quantize_from_data(model, variables, calib, batch=8)

    @_jax.jit
    def infer_jax_int8(images, hw):
        r = detect_batch(
            int8_detector_apply(model, variables, qp, images),
            anchors_j, num_classes=nc, image_hw=hw,
            score_threshold=ecfg.score_threshold,
            iou_threshold=ecfg.nms_iou, approx_topk=False,
        )
        return r.boxes, r.scores, r.classes, r.valid

    def detections_for(arr, backend):
        img = letterbox_numpy_u8(arr, (size, size)).astype(np.float32) / 255.0
        images = img[None]
        hw = np.asarray([[arr.shape[0], arr.shape[1]]], np.float32)
        if backend == "jax_f32":
            b, s, c, v = [np.asarray(x) for x in infer_jax(images, hw)]
        elif backend == "jax_int8":
            b, s, c, v = [np.asarray(x) for x in
                          infer_jax_int8(jnp.asarray(images), jnp.asarray(hw))]
        elif backend == "tflite_f32":
            outs = _interp_outputs(backends[backend], images, hw)
            n_det = [sh[0] for (dt, sh) in outs if dt == "float32" and len(sh) == 2][0]
            b = outs[("float32", (n_det, 4))]
            s = outs[("float32", (n_det,))]
            c = outs[("int32", (n_det,))]
            v = outs[("bool", (n_det,))]
        else:  # tflite_int8: int8 conv stack -> f32 postprocess
            outs = _interp_outputs(backends[backend], images)
            t_outs = [
                jnp.asarray(outs[("float32", (gh, gw, 3, 5 + nc))])
                .reshape(1, gh, gw, 3, 5 + nc)
                for gh, gw in grids
            ]
            r = detect_batch(
                t_outs, anchors_j, num_classes=nc,
                image_hw=jnp.asarray(hw),
                score_threshold=ecfg.score_threshold,
                iou_threshold=ecfg.nms_iou, approx_topk=False,
            )
            b, s, c, v = (np.asarray(r.boxes), np.asarray(r.scores),
                          np.asarray(r.classes), np.asarray(r.valid))
        m = np.asarray(v[0], bool)
        # boxes are (ymin, xmin, ymax, xmax) original-image pixels
        return np.asarray(b[0])[m], np.asarray(s[0])[m], np.asarray(c[0])[m]

    for name, d, fname in (
        ("tflite_f32", f32_dir, "model.tflite"),
        ("tflite_int8", int8_dir, "model_int8.tflite"),
    ):
        interp = tf.lite.Interpreter(model_path=os.path.join(d, fname))
        interp.allocate_tensors()
        backends[name] = interp

    rows = []
    for backend in ("jax_f32", "jax_int8", "tflite_f32", "tflite_int8"):
        ev = MAPEvaluator(num_classes=len(CLASS_NAMES))
        for arr, gtb in samples:
            db, ds_, dc = detections_for(arr, backend)
            # gt is (x1, y1, x2, y2, cls); detections (ymin, xmin, ymax, xmax)
            det_xyxy = db[:, [1, 0, 3, 2]] if len(db) else db.reshape(0, 4)
            ev.add_image(det_xyxy, ds_, dc, gtb)
        aps = ev.compute()
        mAP = float(np.mean(list(aps.values()))) if aps else 0.0
        rows.append((backend, mAP))

    base = rows[0][1]
    print(f"\n## Full-int8 TFLite mAP study ({len(CLASS_NAMES)} classes, "
          f"{size}px, partial convergence, MAP-grade thresh 0)\n")
    print("| backend | mAP | delta vs jax_f32 |")
    print("|---|---|---|")
    for backend, m in rows:
        print(f"| {backend} | {m:.4f} | {m - base:+.4f} |")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--size", type=int, default=160)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--workdir", default=None)
    a = p.parse_args(argv)
    run(epochs=a.epochs, size=a.size, batch=a.batch, workdir=a.workdir)


if __name__ == "__main__":
    main()
