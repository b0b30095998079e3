"""Model export.

The reference exports Keras models to TFLite (OPTIMIZE_FOR_SIZE,
reference: code/yolo.py:386-394), TF-Serving SavedModel with optional
TensorRT FP16 (code/yolo.py:351-383), and TF.js (code/yolo.py:333-348).
Those are TensorFlow-runtime artifacts; the portable JAX-native
equivalent is **StableHLO** via ``jax.export`` — the same IR TFLite /
TF-Serving converters consume — plus an Orbax weights directory.

``export_model`` always writes the StableHLO bundle; when TensorFlow is
importable (not in this image) the tflite/serving/tfjs flavors convert
via ``jax2tf``, otherwise they degrade to the StableHLO bundle with a
clear message.
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
    the conversion source for every TF-side flavor."""
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
        with open(os.path.join(out_dir, "model.tflite"), "wb") as f:
            f.write(conv.convert())
        print(f"TFLite flatbuffer -> {out_dir}/model.tflite")
    elif flavor == "tfjs":
        print(
            f"SavedModel -> {saved_dir}; finish with: tensorflowjs_converter "
            f"--input_format=tf_saved_model {saved_dir} {out_dir}/tfjs_model"
        )
    else:
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
