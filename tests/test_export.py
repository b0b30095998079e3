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
