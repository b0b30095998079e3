"""TF.js export tests: the TF-ops mirror must match the JAX forward,
and the graph-model artifact must round-trip byte-faithfully
(reference behavior covered: code/yolo.py:333-348 TFJS mode)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.configs import RunConfig
from yoloret_tpu.nn.detector import build_detector

tf = pytest.importorskip("tensorflow")

from yoloret_tpu.export.tfjs import (  # noqa: E402
    TFJS_SAFE_OPS,
    build_tf_mirror,
    export_tfjs_graph_model,
    read_graph_model,
)


def _cfg(tmp_path, backbone="mobilenetv2x75"):
    classes = tmp_path / "classes.txt"
    classes.write_text("a\nb\n")
    anchors = tmp_path / "anchors.txt"
    anchors.write_text(
        "10,13, 16,30, 33,23, 30,61, 62,45, 59,119, 116,90, 156,198, 373,326\n"
    )
    return RunConfig(
        backbone=backbone,
        input_size=(64, 64),
        classes_path=str(classes),
        anchors_path=str(anchors),
        bf16=False,
    )


@pytest.mark.parametrize("backbone", ["mobilenetv2x75", "efficientnetb0"])
def test_tf_mirror_matches_jax(tmp_path, backbone):
    """The BN-folded TF-ops forward is the same math as model.apply."""
    cfg = _cfg(tmp_path, backbone)
    raw, variables = build_tf_mirror(cfg, batch=2)
    model = build_detector(backbone, num_classes=2, dtype=jnp.float32)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    jy = model.apply(variables, jnp.asarray(x), False)
    ty = raw(x)
    for a, b in zip(jy, ty):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        # identical math, different executors (XLA vs oneDNN): tiny slack
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-7)


def test_tfjs_artifact_round_trip(tmp_path):
    """Write the graph-model artifact, load it back the way the JS
    runtime would (weights from shards by manifest order, Const nodes
    resolved by name), execute, and match the direct TF mirror."""
    cfg = _cfg(tmp_path)
    out = export_tfjs_graph_model(cfg, str(tmp_path / "tfjs_model"), batch=2)
    meta = json.load(open(os.path.join(out, "model.json")))

    # format + kernel-registry safety
    assert meta["format"] == "graph-model"
    ops = {n["op"] for n in meta["modelTopology"]["node"]}
    assert ops <= TFJS_SAFE_OPS, f"ops outside tfjs registry: {ops - TFJS_SAFE_OPS}"

    # Const payloads must be externalized: no tensor content left inline
    for n in meta["modelTopology"]["node"]:
        if n["op"] == "Const":
            t = n["attr"]["value"]["tensor"]
            assert "tensorContent" not in t and "floatVal" not in t

    # shard bytes must exactly cover the manifest
    group = meta["weightsManifest"][0]
    n_bytes = sum(
        os.path.getsize(os.path.join(out, p)) for p in group["paths"]
    )
    sizes = {"float32": 4, "int32": 4, "bool": 1}
    want = sum(
        int(np.prod(w["shape"]) if w["shape"] else 1) * sizes[w["dtype"]]
        for w in group["weights"]
    )
    assert n_bytes == want

    graph, sig = read_graph_model(out)
    x = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
    with tf.compat.v1.Session(graph=graph) as sess:
        outs = sess.run(
            [sig["outputs"][k]["name"] for k in ("y1", "y2", "y3")],
            {sig["inputs"]["images"]["name"]: x},
        )
    raw, _ = build_tf_mirror(cfg, batch=2)
    for a, b in zip(raw(x), outs):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6, atol=1e-9)


def test_tfjs_unsupported_backbone_raises(tmp_path):
    with pytest.raises(ValueError, match="mobilenetv2"):
        export_tfjs_graph_model(
            _cfg(tmp_path, "yolo_nano"), str(tmp_path / "x")
        )
