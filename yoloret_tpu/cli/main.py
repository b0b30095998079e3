"""CLI entry point — mirrors the reference flag surface
(reference: code/main.py:20-97) with mode dispatch (code/main.py:155-186).

    yoloret --mode=TRAIN --backbone=mobilenetv2x75 --input_size=320 \
        --train_dataset='voc_train_*.txt' --val_dataset=... \
        --classes_path=voc_classes.txt --anchors_path=yolo_anchors.txt

Modes: TRAIN, IMAGE, VIDEO, MAP, ANCHORS, EXPORT (plus the reference's
TFLITE/SERVING/TFJS names routed to EXPORT). ``--config`` overlays a
YAML file onto the flags (code/main.py:111-135). ``--opt=DEBUG`` fixes
seeds and enables NaN checking (code/main.py:140-144).
"""

from __future__ import annotations

import argparse
import os
import sys

from yoloret_tpu.configs import MODE, RunConfig, load_config


def _parse_size(v: str):
    if "," in v:
        h, w = v.split(",")
        return (int(h), int(w))
    return (int(v), int(v))


def build_parser() -> argparse.ArgumentParser:
    # argument_default=SUPPRESS: an attribute exists ONLY when the flag
    # was explicitly passed, so explicit flags always override YAML
    # config values — even when equal to the built-in default.
    p = argparse.ArgumentParser(
        prog="yoloret", description=__doc__,
        argument_default=argparse.SUPPRESS,
    )
    d = RunConfig()
    p.add_argument("--mode", type=str, default="IMAGE",
                   help="TRAIN|IMAGE|VIDEO|MAP|ANCHORS|EXPORT|TFLITE|SERVING|TFJS")
    p.add_argument("--config", type=str, default=None, help="YAML config overlay")
    p.add_argument("--backbone", type=str, help=f"default {d.backbone}")
    p.add_argument("--input_size", type=_parse_size,
                   help="single int or 'h,w', multiples of 32")
    p.add_argument("--num_scales", type=int)
    p.add_argument("--model", type=str, help="weights checkpoint")
    p.add_argument("--train_dataset", type=str)
    p.add_argument("--val_dataset", type=str)
    p.add_argument("--test_dataset", type=str)
    p.add_argument("--classes_path", type=str)
    p.add_argument("--anchors_path", type=str)
    p.add_argument("--batch_size", type=int,
                   help="per-chip; global = batch_size * data-parallel size")
    p.add_argument("--epochs", type=int, nargs=2, metavar=("STAGE1", "STAGE2"))
    p.add_argument("--autoaugment_policy", type=str,
                   choices=["v0", "v1", "v2", "v3"],
                   help="online AutoAugment-for-detection during training")
    p.add_argument("--multi_scale", type=int, nargs="+", metavar="SIZE",
                   help="train each epoch at a size cycled from this list "
                        "(multiples of 32), e.g. --multi_scale 288 320 352")
    p.add_argument("--learning_rate", type=float, nargs=2, metavar=("LR1", "LR2"))
    p.add_argument("--freeze", action="store_true")
    p.add_argument("--no-freeze", dest="freeze", action="store_false")
    p.add_argument("--train_unfreeze", type=str,
                   help="stage-1 weights; implies stage 2 (unfrozen)")
    p.add_argument("--box_loss", type=str, choices=["giou", "mse"])
    p.add_argument("--class_loss", type=str, choices=["bce", "focal"])
    p.add_argument("--use_adv", action="store_true")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--ema_decay", type=float,
                   help="EMA decay (default 0.9999, the reference's "
                        "hard-coded horizon; match ~1-10/total_steps on "
                        "short schedules or the average never warms up)")
    p.add_argument("--rfcr", type=str,
                   choices=["weighted_sum", "concat", "none"],
                   help="RFCR fusion: the paper's WeightedSum (default), "
                        "the legacy concat proto-RFCR, or none (ablation "
                        "baseline; taps feed the neck directly)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize backbone activations in the "
                        "backward pass (memory for ~30%% backbone FLOPs)")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest periodic checkpoint (with optimizer state) and continue")
    p.add_argument("--early_stopping", action="store_true",
                   help="stop the stage when val_loss stalls (reference "
                        "code/train.py:101-105)")
    p.add_argument("--early_stopping_patience", type=int,
                   help="epochs without val_loss improvement before stopping "
                        "(default: stage epochs // 2)")
    p.add_argument("--map_every", type=int,
                   help="evaluate VOC mAP on --test_dataset every N epochs "
                        "during training (0 = stage end only)")
    p.add_argument("--tb_images", type=int,
                   help="write N augmented inputs + detections per epoch to "
                        "TensorBoard (write_images parity)")
    p.add_argument("--truncate_block", type=float,
                   help="freeze only backbone blocks up to this depth index "
                        "(truncated-transfer study); default: whole backbone")
    p.add_argument("--mosaic", type=float,
                   help="ONLINE 4-image mosaic probability per sample "
                        "(extension; the reference's mosaic is offline-"
                        "only) — lands in augment.mosaic_prob")
    p.add_argument("--mixup", type=float,
                   help="ONLINE mixup probability per sample (extension; "
                        "lam~U(0,1) pixel blend + box union) — lands in "
                        "augment.mixup_prob")
    p.add_argument("--score", dest="score_threshold", type=float)
    p.add_argument("--nms_iou", type=float)
    p.add_argument("--exact_nms", action="store_true",
                   help="MAP: reference-exact full-grid per-class NMS "
                        "(slower; the default fast path measures 0.0000 "
                        "mAP delta, see docs/design.md)")
    p.add_argument("--log_dir", type=str)
    p.add_argument("--opt", type=str, choices=["XLA", "DEBUG", "MKL"])
    p.add_argument("--seed", type=int)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--mesh_data", type=int,
                   help="data-parallel degree (default: all devices)")
    p.add_argument("--export", type=str, help="export output dir")
    p.add_argument("--image", type=str, help="image path (IMAGE mode)")
    p.add_argument("--video", type=str, help="video path or 0 (VIDEO mode)")
    p.add_argument("--track_interval", type=int,
                   help="VIDEO: re-detect every N frames, CPU-track "
                        "between (1 = detect every frame)")
    p.add_argument("--output", type=str)
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="serve IMAGE/VIDEO/MAP through the W8A8 backbone "
                        "(nn/int8_infer.py)")
    p.add_argument("--prune", action="store_true")
    return p


def args_to_config(args) -> RunConfig:
    cfg = RunConfig()
    if getattr(args, "config", None):
        cfg = load_config(args.config, cfg)
    overrides = {}
    for f in (
        "backbone input_size num_scales model train_dataset val_dataset "
        "test_dataset classes_path anchors_path batch_size box_loss class_loss use_adv "
        "use_ema ema_decay resume truncate_block score_threshold nms_iou exact_nms "
        "autoaugment_policy "
        "log_dir opt seed "
        "early_stopping early_stopping_patience map_every tb_images "
        "bf16 mesh_data export image video output quantize prune freeze "
        "train_unfreeze track_interval int8 remat rfcr"
    ).split():
        if hasattr(args, f):
            overrides[f] = getattr(args, f)
    if hasattr(args, "multi_scale"):
        overrides["multi_scale"] = list(args.multi_scale)
    if hasattr(args, "epochs"):
        overrides["epochs"] = tuple(args.epochs)
    if hasattr(args, "learning_rate"):
        overrides["learning_rate"] = tuple(args.learning_rate)
    if getattr(args, "train_unfreeze", None) and "freeze" not in overrides:
        overrides["freeze"] = False
    aug = dict(cfg.augment or {})
    if getattr(args, "mosaic", None) is not None:
        aug["mosaic_prob"] = float(args.mosaic)
    if getattr(args, "mixup", None) is not None:
        aug["mixup_prob"] = float(args.mixup)
    if aug:
        overrides["augment"] = aug
    return cfg.replace(**overrides)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    mode_name = args.mode.upper()
    cfg = args_to_config(args)

    if cfg.opt and cfg.opt.upper() == "DEBUG":
        # reference main.py:140-144: fixed seed + determinism/debug aids
        import jax

        jax.config.update("jax_debug_nans", True)
        cfg = cfg.replace(seed=0)

    if mode_name == "TRAIN":
        from yoloret_tpu.train.trainer import train

        train(cfg)
    elif mode_name == "TRAIN_BACKBONE":
        print("TRAIN_BACKBONE: pretraining the backbone alone is handled by "
              "the truncated-transfer weight import; see docs/parity.md")
        return 2
    elif mode_name == "IMAGE":
        from yoloret_tpu.infer import Predictor

        pred = Predictor(
            backbone=cfg.backbone, weights=cfg.model,
            classes_path=cfg.classes_path, anchors_path=cfg.anchors_path,
            input_hw=cfg.input_size, score_threshold=cfg.score_threshold,
            iou_threshold=cfg.nms_iou, bf16=cfg.bf16, use_ema=cfg.use_ema,
            rfcr=cfg.rfcr, **_int8_kw(cfg),
        )
        img, dets = pred.detect_image(cfg.image or _demo_image())
        out = cfg.output or "demo_out.png"
        img.save(out)
        for dmt in dets:
            print(f"{dmt.class_name} {dmt.score:.3f} {tuple(round(v, 1) for v in dmt.box)}")
        print(f"wrote {out}")
    elif mode_name == "VIDEO":
        from yoloret_tpu.infer import Predictor

        if not cfg.video:
            print("--video required", file=sys.stderr)
            return 2
        pred = Predictor(
            backbone=cfg.backbone, weights=cfg.model,
            classes_path=cfg.classes_path, anchors_path=cfg.anchors_path,
            input_hw=cfg.input_size, score_threshold=cfg.score_threshold,
            iou_threshold=cfg.nms_iou, bf16=cfg.bf16,
            rfcr=cfg.rfcr, **_int8_kw(cfg),
        )
        n = pred.detect_video(cfg.video, cfg.output,
                              track_interval=cfg.track_interval)
        print(f"processed {n} frames")
    elif mode_name == "MAP":
        from yoloret_tpu.data import Dataset, DatasetMode, load_anchors, load_classes
        from yoloret_tpu.eval import evaluate_map
        from yoloret_tpu.infer import Predictor

        assert cfg.test_dataset and cfg.classes_path and cfg.anchors_path
        class_names = load_classes(cfg.classes_path)
        anchors = load_anchors(cfg.anchors_path)
        pred = Predictor(
            backbone=cfg.backbone, weights=cfg.model,
            class_names=class_names, anchors=anchors,
            input_hw=cfg.input_size, bf16=cfg.bf16, use_ema=cfg.use_ema,
            score_threshold=0.0,  # reference sets score=0 for MAP, main.py:172
            rfcr=cfg.rfcr, **_int8_kw(cfg),
        )
        ds = Dataset(
            cfg.test_dataset, batch_size=max(cfg.batch_size, 1), anchors=anchors,
            num_classes=len(class_names), input_hw=cfg.input_size,
            mode=DatasetMode.TEST,
        )
        kw = {}
        if cfg.exact_nms:
            h, w = cfg.input_size
            kw = dict(pool="per_class", approx_topk=False,
                      num_candidates=sum((h // s) * (w // s) * 3
                                         for s in (32, 16, 8)))
        if cfg.mesh_data and cfg.mesh_data > 1:
            # Data-parallel evaluation: batches shard over the mesh's
            # data axis (batch_size must be a multiple of mesh_data).
            from yoloret_tpu.parallel import make_mesh

            kw["mesh"] = make_mesh(data=cfg.mesh_data)
        evaluate_map(pred.model, pred.variables, ds, anchors, class_names,
                     nms_iou=cfg.nms_iou, **kw)
    elif mode_name == "ANCHORS":
        from yoloret_tpu.tools.kmeans import kmeans_anchors_cli

        assert cfg.train_dataset, "--train_dataset required for ANCHORS"
        kmeans_anchors_cli(cfg.train_dataset, cfg.output or "yolo_anchors.txt")
    elif mode_name in ("EXPORT", "TFLITE", "SERVING", "TFJS"):
        from yoloret_tpu.export import export_model

        export_model(cfg, flavor=mode_name.lower())
    elif mode_name == "PRUNE":
        # The reference declares MODE.PRUNE but ships no handler
        # (code/main.py:158-160, code/yolo3/enums.py) — report clearly
        # instead of crashing.
        print("PRUNE: model pruning is not implemented (the reference "
              "declares the mode without a handler); --quantize is "
              "likewise threaded but inert for parity")
        return 2
    else:
        print(f"unknown mode {args.mode!r}", file=sys.stderr)
        return 2
    return 0


def _int8_kw(cfg) -> dict:
    """Predictor kwargs for --int8: W8A8 backbone calibrated on up to
    ``quantize_samples`` letterboxed images from the test/train lists
    (uniform noise when no list is configured)."""
    if not cfg.int8:
        return {}
    calib = None
    source = cfg.test_dataset or cfg.train_dataset
    if source:
        import glob as _glob

        import numpy as np
        from PIL import Image

        from yoloret_tpu.data.annotations import parse_annotation_line
        from yoloret_tpu.ops.letterbox import letterbox_numpy_u8

        imgs = []
        for path in sorted(_glob.glob(source)):
            if path.endswith(".tfrecord"):
                # TFRecord shards: pull encoded bytes straight from the
                # record stream instead of parsing text lines
                import io

                from yoloret_tpu.data.tfrecord import (
                    Example,
                    index_tfrecord,
                    read_record_at,
                )

                for off, ln in index_tfrecord(path):
                    ex = Example.parse(read_record_at(path, off, ln))
                    raw = ex.features["image/encoded"]
                    arr = np.asarray(
                        Image.open(io.BytesIO(raw)).convert("RGB"), np.uint8)
                    imgs.append(letterbox_numpy_u8(arr, cfg.input_size))
                    if len(imgs) >= cfg.quantize_samples:
                        break
                if len(imgs) >= cfg.quantize_samples:
                    break
                continue
            with open(path) as fh:
                for line in fh:
                    if not line.strip():
                        continue
                    img_path, _ = parse_annotation_line(line)
                    arr = np.asarray(
                        Image.open(img_path).convert("RGB"), np.uint8)
                    imgs.append(letterbox_numpy_u8(arr, cfg.input_size))
                    if len(imgs) >= cfg.quantize_samples:
                        break
            if len(imgs) >= cfg.quantize_samples:
                break
        if imgs:
            calib = np.stack(imgs)
    return dict(use_int8=True, calibration_images=calib)


def _demo_image() -> str:
    # vendored VOC demo frame (reference ships demo_images/ for the same
    # purpose, code/yolo.py demo flow) — keeps the repo self-contained
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "demo.jpg")


def run():
    raise SystemExit(main())


if __name__ == "__main__":
    run()
