"""StableHLO export tests: serialize, deserialize, run, match."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

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
