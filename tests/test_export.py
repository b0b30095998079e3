"""StableHLO export tests: serialize, deserialize, run, match."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.configs import RunConfig
from yoloret_tpu.export import export_stablehlo
from yoloret_tpu.utils.checkpoint import load_params


def _cfg(tmp_path, quantize=False):
    classes = tmp_path / "classes.txt"
    classes.write_text("a\nb\n")
    anchors = tmp_path / "anchors.txt"
    anchors.write_text("10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326\n")
    return RunConfig(
        backbone="mobilenetv2x75",
        input_size=(64, 64),
        classes_path=str(classes),
        anchors_path=str(anchors),
        bf16=False,
        quantize=quantize,
        score_threshold=0.1,
    )


def test_export_bundle_runs(tmp_path):
    out = str(tmp_path / "bundle")
    export_stablehlo(_cfg(tmp_path), out, batch=2)
    assert os.path.exists(out + "/model.stablehlo")
    meta = json.load(open(out + "/model.json"))
    assert meta["num_classes"] == 2 and meta["batch"] == 2

    from jax import export as jax_export

    exported = jax_export.deserialize(open(out + "/model.stablehlo", "rb").read())
    variables = load_params(out + "/weights")
    images = jnp.zeros((2, 64, 64, 3), jnp.float32)
    hw = jnp.full((2, 2), 64.0, jnp.float32)
    boxes, scores, classes, valid = exported.call(variables, images, hw)
    assert boxes.shape[0] == 2 and boxes.shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(scores)))


def test_export_quantized_weights(tmp_path):
    out = str(tmp_path / "qbundle")
    export_stablehlo(_cfg(tmp_path, quantize=True), out, batch=1)
    restored = load_params(out + "/weights")
    assert "params_int8" in restored
    # at least one kernel stored as int8 + scale
    import jax.tree_util as jtu

    leaves = jtu.tree_leaves_with_path(restored["params_int8"])
    int8 = [l for p, l in leaves if getattr(l, "dtype", None) == np.int8]
    assert int8, "no int8 kernels in quantized export"


def _peaked_checkpoint(tmp_path, size=96):
    """Detector weights with the head kernels amplified so scores form
    strong input-dependent peaks — stable argmax across backends (random
    init scores everything ~0.25, and NMS tie-breaks then differ between
    XLA and XNNPACK numerics)."""
    from yoloret_tpu.nn import build_detector
    from yoloret_tpu.utils.checkpoint import save_params

    model = build_detector("mobilenetv2x75", num_classes=2)
    v = model.init(jax.random.PRNGKey(3), jnp.zeros((1, size, size, 3)), False)

    def amplify(tree, path=()):
        out = {}
        for k, val in tree.items():
            if isinstance(val, dict):
                out[k] = amplify(val, path + (k,))
            elif k == "kernel" and any("head" in p for p in path):
                # x4: distinct non-saturated scores (0.31-0.37 with seed
                # 3); x30 saturates sigmoids to ties and tie-breaks then
                # legitimately differ between XLA and XNNPACK numerics
                out[k] = val * 4.0
            else:
                out[k] = val
        return out

    params = amplify(jax.device_get(v["params"]))
    path = str(tmp_path / "peaked")
    save_params(path, {"params": params, "batch_stats": v["batch_stats"]})
    return path


def test_tflite_conversion_runs_and_matches(tmp_path):
    """The real edge path (reference code/yolo.py:386-394): jax2tf ->
    SavedModel -> TFLite flatbuffer -> tf.lite.Interpreter, detections
    matching the JAX program."""
    tf = pytest.importorskip("tensorflow")

    from yoloret_tpu.export.export import _build_infer, export_tf_flavor

    size = 96  # > 64 so the pool is partial: regression-guards the
    # approx_max_k VHLO-downgrade failure (exports force exact top-k)
    cfg = _cfg(tmp_path).replace(
        input_size=(size, size),
        model=_peaked_checkpoint(tmp_path, size),
        score_threshold=0.3,
    )
    out = export_tf_flavor(cfg, str(tmp_path / "tfl"), "tflite")
    assert os.path.exists(os.path.join(out, "model.tflite"))
    assert os.path.isdir(os.path.join(out, "saved_model"))

    rng = np.random.RandomState(0)
    images = (rng.rand(1, size, size, 3) ** 2).astype(np.float32)
    hw = np.full((1, 2), float(size), np.float32)
    infer, _ = _build_infer(cfg)
    jb, js, jc, jv = [np.asarray(x) for x in infer(images, hw)]

    interp = tf.lite.Interpreter(
        model_path=os.path.join(out, "model.tflite"))
    interp.allocate_tensors()
    for d in interp.get_input_details():
        interp.set_tensor(d["index"], images if d["shape"][-1] == 3 else hw)
    interp.invoke()
    outs = {
        (str(o["dtype"].__name__), tuple(o["shape"][1:])):
            interp.get_tensor(o["index"])
        for o in interp.get_output_details()
    }
    n = jb.shape[1]
    tb = outs[("float32", (n, 4))]
    ts = outs[("float32", (n,))]
    tv = outs[("bool", (n,))]
    tc = outs[("int32", (n,))]
    assert jv.sum() > 0, "peaked weights must produce detections"
    np.testing.assert_array_equal(tv, jv)
    np.testing.assert_array_equal(tc, jc)
    m = jv[0]
    np.testing.assert_allclose(ts[0][m], js[0][m], atol=0.02)
    np.testing.assert_allclose(tb[0][m], jb[0][m], atol=1.5)


def test_tf_flavors_degrade_without_tf(tmp_path, capsys, monkeypatch):
    """Where TF is absent, TFLITE/SERVING/TFJS modes fall back to the
    StableHLO bundle with a clear message."""
    import sys

    from yoloret_tpu.export.export import _build_infer, export_model

    monkeypatch.setitem(sys.modules, "tensorflow", None)  # import -> ImportError
    cfg = _cfg(tmp_path).replace(export=str(tmp_path / "fb"))
    out = export_model(cfg, flavor="tflite")
    assert os.path.exists(os.path.join(out, "model.stablehlo"))
    assert "StableHLO bundle" in capsys.readouterr().out

    # the conversion source itself must be a runnable jax function
    infer, names = _build_infer(cfg)
    boxes, scores, classes, valid = infer(
        jnp.zeros((1, 64, 64, 3), jnp.float32), jnp.full((1, 2), 64.0)
    )
    assert names == ["a", "b"] and boxes.shape[-1] == 4
    assert np.all(np.isfinite(np.asarray(scores)))


def test_export_quantized_round_trip(tmp_path):
    """int8 bundle -> dequantize -> run the SAME StableHLO program ->
    detections numerically close to the fp32 bundle (the full edge
    deployment path, not just a storage check)."""
    from jax import export as jax_export

    from yoloret_tpu.export.quantize import dequantize_tree

    cfg = _cfg(tmp_path)
    out_fp = str(tmp_path / "fp")
    export_stablehlo(cfg, out_fp, batch=1)
    out_q = str(tmp_path / "q")
    export_stablehlo(cfg.replace(quantize=True), out_q, batch=1)

    exported = jax_export.deserialize(open(out_q + "/model.stablehlo", "rb").read())
    fp_vars = load_params(out_fp + "/weights")
    q = load_params(out_q + "/weights")
    deq_vars = {
        "params": dequantize_tree(q["params_int8"]),
        "batch_stats": jax.tree.map(jnp.asarray, q["batch_stats"]),
    }

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    hw = jnp.full((1, 2), 64.0, jnp.float32)
    b_fp, s_fp, c_fp, v_fp = exported.call(fp_vars, images, hw)
    b_q, s_q, c_q, v_q = exported.call(deq_vars, images, hw)
    # int8 per-channel weight quantization: scores drift slightly, the
    # detection slate stays aligned
    np.testing.assert_allclose(np.asarray(s_q), np.asarray(s_fp), atol=0.05)
    np.testing.assert_array_equal(np.asarray(c_q), np.asarray(c_fp))

    meta = json.load(open(out_q + "/model.json"))
    assert meta["quantized"] is True
    assert meta["calling_convention_version"] >= 1
    assert meta["jax_version"]


def test_tflite_full_int8_with_calibration(tmp_path):
    """--quantize + TFLITE: calibrated full-int8 flatbuffer of the conv
    stack (the graph the reference's TFLite export covers, yolo.py:
    386-394) alongside the f32 pipeline artifact. int8 tensors inside,
    float IO; raw head outputs feed the f32 postprocess and reproduce
    the f32 pipeline's detections."""
    tf = pytest.importorskip("tensorflow")

    from PIL import Image

    from yoloret_tpu.export.export import _build_infer, export_tf_flavor

    size = 96
    rng = np.random.RandomState(1)
    lines = []
    for i in range(3):
        arr = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
        p = tmp_path / f"cal{i}.jpg"
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 10,10,60,50,0")
    ann = tmp_path / "cal.txt"
    ann.write_text("\n".join(lines) + "\n")

    cfg = _cfg(tmp_path).replace(
        input_size=(size, size),
        model=_peaked_checkpoint(tmp_path, size),
        score_threshold=0.3,
        quantize=True,
        quantize_samples=3,
        train_dataset=str(ann),
    )
    out = export_tf_flavor(cfg, str(tmp_path / "int8"), "tflite")
    path = os.path.join(out, "model_int8.tflite")
    assert os.path.exists(path)
    assert os.path.exists(os.path.join(out, "model.tflite"))  # f32 pipeline

    interp = tf.lite.Interpreter(model_path=path)
    dtypes = {d["dtype"].__name__ for d in interp.get_tensor_details()}
    assert "int8" in dtypes, dtypes  # actually integer-quantized inside
    assert all(d["dtype"].__name__ == "float32"
               for d in interp.get_input_details())  # float IO

    interp.allocate_tensors()
    rng = np.random.RandomState(0)
    images = (rng.rand(1, size, size, 3) ** 2).astype(np.float32)
    d_in = interp.get_input_details()[0]
    interp.set_tensor(d_in["index"], images)
    interp.invoke()
    outs = {
        tuple(o["shape"][1:]): interp.get_tensor(o["index"])
        for o in interp.get_output_details()
    }

    # raw int8 head outputs feed the f32 postprocess: detections match
    # the f32 pipeline
    import jax.numpy as _jnp

    from yoloret_tpu.data.annotations import load_anchors
    from yoloret_tpu.ops import detect_batch

    anchors = load_anchors(cfg.anchors_path)
    grids = [(size // s, size // s) for s in (32, 16, 8)]
    t_outs = [
        _jnp.asarray(outs[(gh, gw, 3, 7)]).reshape(1, gh, gw, 3, 7)
        for gh, gw in grids
    ]
    hw = np.full((1, 2), float(size), np.float32)
    r = detect_batch(
        t_outs, _jnp.asarray(anchors, _jnp.float32), num_classes=2,
        image_hw=_jnp.asarray(hw), score_threshold=0.3, iou_threshold=0.5,
        approx_topk=False,
    )
    infer, _ = _build_infer(cfg)
    jb, js, jc, jv = [np.asarray(x) for x in infer(images, hw)]
    assert jv.sum() > 0
    tv, ts, tb = np.asarray(r.valid), np.asarray(r.scores), np.asarray(r.boxes)
    m = jv[0] & tv[0]
    assert m.sum() >= max(1, int(jv.sum()) - 1)  # int8 keeps detections
    np.testing.assert_allclose(ts[0][m], js[0][m], atol=0.1)
    # box regression decodes through exp(): int8 noise on these
    # UNTRAINED weights shifts coordinates, so assert overlap (the
    # mAP-matching criterion) instead of pixel equality; the accuracy
    # cost on trained weights is measured by tools/int8_study.py
    def iou(a, b):
        yx1 = np.maximum(a[:2], b[:2])
        yx2 = np.minimum(a[2:], b[2:])
        inter = np.prod(np.maximum(yx2 - yx1, 0.0))
        ua = np.prod(a[2:] - a[:2]) + np.prod(b[2:] - b[:2]) - inter
        return inter / max(ua, 1e-9)

    ious = [iou(tb[0][i], jb[0][i]) for i in np.where(m)[0]]
    assert np.mean(ious) >= 0.5, ious


def test_serving_savedmodel_writes_warmup(tmp_path):
    """The serving flavor writes TF-Serving warm-up assets (the
    reference's intended-but-broken warm-up write, code/yolo.py:368-383)
    at the contract path, and the hand-encoded PredictionLog round-trips
    into requests that actually drive the exported signature."""
    tf = pytest.importorskip("tensorflow")
    from yoloret_tpu.export.export import export_tf_flavor
    from yoloret_tpu.export.warmup import read_warmup_records

    cfg = _cfg(tmp_path)
    out = export_tf_flavor(cfg, str(tmp_path / "srv"), "serving")
    saved = os.path.join(out, "saved_model")
    wpath = os.path.join(saved, "assets.extra", "tf_serving_warmup_requests")
    assert os.path.exists(wpath), "warm-up record missing from assets.extra"

    recs = read_warmup_records(saved)
    assert len(recs) == 2
    name, sig, inputs = recs[0]
    assert name == cfg.backbone and sig == "serving_default"
    assert set(inputs) == {"images", "image_hw"}
    assert inputs["images"].shape == (1, 64, 64, 3)
    assert inputs["images"].dtype == np.float32

    m = tf.saved_model.load(saved)
    fn = m.signatures["serving_default"]
    res = fn(images=tf.constant(inputs["images"]),
             image_hw=tf.constant(inputs["image_hw"]))
    assert all(np.isfinite(v.numpy()).all() for v in res.values())
