"""Model export.

The reference exports Keras models to TFLite (OPTIMIZE_FOR_SIZE,
reference: code/yolo.py:386-394), TF-Serving SavedModel with optional
TensorRT FP16 (code/yolo.py:351-383), and TF.js (code/yolo.py:333-348).
Those are TensorFlow-runtime artifacts; the portable JAX-native
equivalent is **StableHLO** via ``jax.export`` — the same IR TFLite /
TF-Serving converters consume — plus an Orbax weights directory.

``export_model`` always writes the StableHLO bundle; when TensorFlow is
importable (TF 2.21 is in this image) the tflite/serving/tfjs flavors
convert via ``jax2tf`` — plus a from-scratch tfjs graph-model writer
(export/tfjs.py) since the ``tensorflowjs`` pip is absent — otherwise
they degrade to the StableHLO bundle with a clear message.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.configs import RunConfig
from yoloret_tpu.data.annotations import load_anchors, load_classes
from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import detect_batch
from yoloret_tpu.utils.checkpoint import load_params, save_params


def export_stablehlo(cfg: RunConfig, out_dir: str, batch: int = 1) -> str:
    """Serialize the FULL inference program (forward + decode + NMS) as
    StableHLO with the weights baked out to an Orbax directory."""
    os.makedirs(out_dir, exist_ok=True)
    class_names = load_classes(cfg.classes_path)
    anchors = load_anchors(cfg.anchors_path)
    num_classes = len(class_names)

    model = build_detector(
        cfg.backbone, num_classes=num_classes,
        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_size, 3)), False
    )
    if cfg.model:
        variables = load_params(cfg.model, like=variables)

    anchors_j = jnp.asarray(anchors, jnp.float32)

    def infer(variables, images, image_hw):
        outs = model.apply(variables, images, False)
        # Exact top-k for the portable artifact (see _build_infer note).
        r = detect_batch(
            outs, anchors_j, num_classes=num_classes, image_hw=image_hw,
            score_threshold=cfg.score_threshold, iou_threshold=cfg.nms_iou,
            approx_topk=False,
        )
        return r.boxes, r.scores, r.classes, r.valid

    from jax import export as jax_export

    h, w = cfg.input_size
    spec = (
        jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), variables),
        jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch, 2), jnp.float32),
    )
    exported = jax_export.export(jax.jit(infer))(*spec)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    if cfg.quantize:
        # Real int8 weight quantization — the reference's --quantize is
        # inert and TFLite's OPTIMIZE_FOR_SIZE does the equivalent
        # weight compression (yolo.py:386-394).
        from yoloret_tpu.export.quantize import quantize_tree

        qparams, stats = quantize_tree(jax.device_get(variables["params"]))
        save_params(
            os.path.join(out_dir, "weights"),
            {"params_int8": qparams, "batch_stats": variables["batch_stats"]},
        )
        print(
            f"int8 weights: {stats['bytes_fp'] / 1e6:.2f} MB -> "
            f"{stats['bytes_q'] / 1e6:.2f} MB"
        )
    else:
        save_params(os.path.join(out_dir, "weights"), variables)
    meta = {
        "backbone": cfg.backbone,
        "input_size": list(cfg.input_size),
        "batch": batch,
        "num_classes": num_classes,
        "class_names": class_names,
        "anchors": np.asarray(anchors).tolist(),
        "score_threshold": cfg.score_threshold,
        "nms_iou": cfg.nms_iou,
        "quantized": bool(cfg.quantize),
        "outputs": ["boxes[ymin,xmin,ymax,xmax]", "scores", "classes", "valid"],
        # Compatibility provenance: jax.export guarantees deserialization
        # across releases per calling-convention version (see
        # docs/usage.md "Export" for the TF-side conversion recipe).
        "jax_version": jax.__version__,
        "calling_convention_version": int(
            getattr(exported, "calling_convention_version", 0)
        ),
        "platforms": list(getattr(exported, "platforms", ())),
    }
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"StableHLO bundle -> {out_dir} ({len(blob)} bytes IR)")
    return out_dir


def _build_infer(cfg: RunConfig):
    """(infer(images, image_hw), class_names) with weights closed over —
    the conversion source for every TF-side flavor.

    Always the f32 graph regardless of ``cfg.bf16``: a bf16 graph makes
    the TFLite converter fail outright ("failed to legalize tfl.pad"),
    bf16 is a TPU compute choice with no meaning for edge artifacts, and
    params are stored f32 anyway (found by driving --mode=TFLITE with
    default flags in round 3 — round-2 tests always passed bf16=False).
    """
    class_names = load_classes(cfg.classes_path)
    anchors = load_anchors(cfg.anchors_path)
    num_classes = len(class_names)
    model = build_detector(cfg.backbone, num_classes=num_classes,
                           dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_size, 3)), False
    )
    if cfg.model:
        variables = load_params(cfg.model, like=variables)
    anchors_j = jnp.asarray(anchors, jnp.float32)

    def infer(images, image_hw):
        outs = model.apply(variables, images, False)
        # approx_topk=False: jax.lax.approx_max_k lowers to an HLO the
        # TFLite VHLO downgrade rejects ("failed to convert VHLO to
        # v1.0.0"), and edge runtimes lack the TPU partial-reduce
        # anyway. Exact top-k is measured mAP-identical
        # (tools/topk_study.py) and fully portable.
        r = detect_batch(
            outs, anchors_j, num_classes=num_classes, image_hw=image_hw,
            score_threshold=cfg.score_threshold, iou_threshold=cfg.nms_iou,
            approx_topk=False,
        )
        return r.boxes, r.scores, r.classes, r.valid

    return infer, class_names


def _representative_dataset(cfg: RunConfig, batch: int, n_samples: int = 32):
    """Calibration feed for full-int8 conversion: letterboxed images from
    ``cfg.test_dataset`` / ``cfg.train_dataset`` annotation lists when
    available (the representative distribution the quantizer needs),
    uniform noise otherwise. Yields [images, image_hw] matching the
    serving signature."""
    h, w = cfg.input_size

    def gen():
        import numpy as _np

        from yoloret_tpu.data.annotations import parse_annotation_line
        from yoloret_tpu.ops.letterbox import letterbox_numpy_u8

        paths = []
        for src in (cfg.test_dataset, cfg.train_dataset):
            if src and os.path.exists(src) and not any(c in src for c in "*?["):
                with open(src) as fh:
                    paths = [parse_annotation_line(l)[0]
                             for l in fh if l.strip()]
                break
        rng = _np.random.RandomState(0)
        for i in range(n_samples):
            if paths:
                from PIL import Image

                arr = _np.asarray(
                    Image.open(paths[i % len(paths)]).convert("RGB"), _np.uint8
                )
                ih, iw = arr.shape[:2]
                img = letterbox_numpy_u8(arr, (h, w)).astype(_np.float32) / 255.0
            else:
                ih, iw = h, w
                img = rng.rand(h, w, 3).astype(_np.float32)
            images = _np.broadcast_to(img, (batch, h, w, 3)).copy()
            hw = _np.full((batch, 2), 0.0, _np.float32)
            hw[:, 0], hw[:, 1] = float(ih), float(iw)
            # dict keyed by signature input names: the calibrator's
            # positional order need not match the signature order
            yield {"images": images, "image_hw": hw}

    return gen


def _export_tflite_int8(cfg: RunConfig, out_dir: str, batch: int) -> str:
    """Full-int8 (calibrated) TFLite of the CONV STACK — the graph the
    reference's own TFLite export covers (it converts ``yolo_model``
    without the NMS tail, code/yolo.py:386-394). Decode/NMS stay f32 by
    design (this repo's convention: f32 for decode/NMS math; TFLite's
    calibrator also cannot walk the sort/while NMS tail — it segfaults).
    Edge runtime: invoke ``model_int8.tflite`` for the three raw head
    tensors, then run the tiny float postprocess (or the f32
    ``model.tflite`` pipeline artifact)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    class_names = load_classes(cfg.classes_path)
    num_classes = len(class_names)
    # f32 reference graph regardless of cfg.bf16: the int8 quantizer
    # cannot legalize bf16 ops (tfl.pad etc.), and bf16 is a TPU compute
    # choice with no meaning for an edge-CPU artifact
    model = build_detector(cfg.backbone, num_classes=num_classes,
                           dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_size, 3)), False
    )
    if cfg.model:
        variables = load_params(cfg.model, like=variables)

    def raw(images):
        return model.apply(variables, images, False)

    h, w = cfg.input_size
    tf_fn = tf.function(
        jax2tf.convert(raw, with_gradient=False),
        input_signature=[
            tf.TensorSpec([batch, h, w, 3], tf.float32, name="images"),
        ],
        autograph=False,
    )
    module = tf.Module()
    module.raw = tf_fn
    raw_dir = os.path.join(out_dir, "saved_model_raw")
    tf.saved_model.save(module, raw_dir, signatures={"serving_default": tf_fn})
    conv = tf.lite.TFLiteConverter.from_saved_model(raw_dir)
    conv.optimizations = [tf.lite.Optimize.DEFAULT]
    rep = _representative_dataset(cfg, batch, n_samples=cfg.quantize_samples)

    def images_only():
        for d in rep():
            yield {"images": d["images"]}

    conv.representative_dataset = images_only
    conv.target_spec.supported_ops = [
        tf.lite.OpsSet.TFLITE_BUILTINS_INT8,
        tf.lite.OpsSet.TFLITE_BUILTINS,  # fallback for non-quantizable ops
    ]
    path = os.path.join(out_dir, "model_int8.tflite")
    try:
        blob = conv.convert()
    except Exception as e:  # e.g. tfl.pad legalization on some backbones
        print(
            f"full-int8 conversion failed for backbone {cfg.backbone!r} "
            f"({type(e).__name__}: {str(e)[:200]}...); the dynamic-range "
            f"f32 pipeline artifact model.tflite is still valid"
        )
        return ""
    with open(path, "wb") as f:
        f.write(blob)
    print(f"TFLite flatbuffer (full-int8 conv stack, calibrated on "
          f"{cfg.quantize_samples} samples) -> {path}")
    return path


def export_tf_flavor(cfg: RunConfig, out_dir: str, flavor: str,
                     batch: int = 1) -> str:
    """jax2tf conversion to the reference's TF artifacts
    (reference: code/yolo.py:333-394): SavedModel (``serving``), TFLite
    flatbuffer with size optimization (``tflite``,
    OPTIMIZE_FOR_SIZE parity yolo.py:391), or a SavedModel staged for
    the tfjs converter (``tfjs``). Requires a TensorFlow runtime (TF 2.21
    is in this image; tests/test_export.py exercises these paths end to
    end) — when TF is absent, export_model falls back to the StableHLO
    bundle."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    os.makedirs(out_dir, exist_ok=True)
    infer, _ = _build_infer(cfg)
    h, w = cfg.input_size
    tf_fn = tf.function(
        jax2tf.convert(infer, with_gradient=False),
        input_signature=[
            tf.TensorSpec([batch, h, w, 3], tf.float32, name="images"),
            tf.TensorSpec([batch, 2], tf.float32, name="image_hw"),
        ],
        autograph=False,
    )
    module = tf.Module()
    module.infer = tf_fn
    saved_dir = os.path.join(out_dir, "saved_model")
    tf.saved_model.save(
        module, saved_dir, signatures={"serving_default": tf_fn}
    )
    if flavor == "tflite":
        conv = tf.lite.TFLiteConverter.from_saved_model(saved_dir)
        conv.optimizations = [tf.lite.Optimize.DEFAULT]
        blob = conv.convert()  # convert BEFORE open: an open-then-fail
        # would leave a truncated model.tflite behind
        with open(os.path.join(out_dir, "model.tflite"), "wb") as f:
            f.write(blob)
        print(f"TFLite flatbuffer (dynamic-range) -> {out_dir}/model.tflite")
        if cfg.quantize:
            _export_tflite_int8(cfg, out_dir, batch)
    elif flavor == "tfjs":
        from yoloret_tpu.export.tfjs import export_tfjs_graph_model

        try:
            tfjs_dir = export_tfjs_graph_model(
                cfg, os.path.join(out_dir, "tfjs_model"), batch=batch
            )
            print(
                f"TF.js graph model (conv stack, raw heads) -> {tfjs_dir}; "
                f"full-pipeline SavedModel staged at {saved_dir} for "
                f"tensorflowjs_converter if the NMS tail is wanted in JS"
            )
        except ValueError as e:  # backbone outside the mirrored families
            print(
                f"native tfjs converter: {e}; SavedModel staged at "
                f"{saved_dir} — finish with: tensorflowjs_converter "
                f"--input_format=tf_saved_model {saved_dir} "
                f"{out_dir}/tfjs_model"
            )
    else:
        # Warm-up assets: TF-Serving pre-executes these requests before
        # taking traffic (the reference's intended-but-broken warm-up
        # write, code/yolo.py:368-383). Two representative batches cover
        # compile + cache warm.
        from yoloret_tpu.export.warmup import write_warmup_records

        rep = _representative_dataset(cfg, batch, n_samples=2)
        write_warmup_records(saved_dir, rep(), model_name=cfg.backbone)
        print(f"TF-Serving SavedModel -> {saved_dir}")
    return out_dir


def export_model(cfg: RunConfig, flavor: str = "export") -> str:
    out_dir = cfg.export or cfg.output or f"export_{cfg.backbone}"
    if flavor in ("tflite", "serving", "tfjs"):
        try:
            import tensorflow  # noqa: F401

            return export_tf_flavor(cfg, out_dir, flavor)
        except ImportError:
            print(
                f"{flavor}: TensorFlow runtime not present in this image; "
                "writing the portable StableHLO bundle instead (feeds the "
                "same converters offline — recipe in docs/usage.md)."
            )
    return export_stablehlo(cfg, out_dir)
