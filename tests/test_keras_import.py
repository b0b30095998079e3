"""Keras H5 -> pytree weight-import tests using synthetic H5 files whose
shapes are derived from our own init trees (real ImageNet H5s are not
available offline; structure/naming matches keras-applications/qubvel)."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax
import jax.numpy as jnp

from yoloret_tpu.nn import build_detector
from yoloret_tpu.utils.keras_import import load_backbone_weights


def _keras_mnv2_layers(body_params, body_stats):
    """Yield (keras_layer_name, weight_name, shape) for MNv2 0.75."""
    def conv(keras, path, depthwise=False):
        k = path["kernel"]
        shape = tuple(k.shape)
        if depthwise:
            shape = (shape[0], shape[1], shape[3], shape[2])
        return keras, ("depthwise_kernel" if depthwise else "kernel"), shape

    def bn(keras, p, s):
        return [
            (keras, "gamma", tuple(p["scale"].shape)),
            (keras, "beta", tuple(p["bias"].shape)),
            (keras, "moving_mean", tuple(s["mean"].shape)),
            (keras, "moving_variance", tuple(s["var"].shape)),
        ]

    out = [conv("Conv1", body_params["stem"]["conv"])]
    out += bn("bn_Conv1", body_params["stem"]["bn"], body_stats["stem"]["bn"])
    b0 = body_params["block_0"]
    s0 = body_stats["block_0"]
    out.append(conv("expanded_conv_depthwise", b0["depthwise"]["dwconv"], depthwise=True))
    out += bn("expanded_conv_depthwise_BN", b0["depthwise"]["bn"], s0["depthwise"]["bn"])
    out.append(conv("expanded_conv_project", b0["project"]["conv"]))
    out += bn("expanded_conv_project_BN", b0["project"]["bn"], s0["project"]["bn"])
    n = 1
    while f"block_{n}" in body_params:
        bp, bs = body_params[f"block_{n}"], body_stats[f"block_{n}"]
        out.append(conv(f"block_{n}_expand", bp["expand"]["conv"]))
        out += bn(f"block_{n}_expand_BN", bp["expand"]["bn"], bs["expand"]["bn"])
        out.append(conv(f"block_{n}_depthwise", bp["depthwise"]["dwconv"], depthwise=True))
        out += bn(f"block_{n}_depthwise_BN", bp["depthwise"]["bn"], bs["depthwise"]["bn"])
        out.append(conv(f"block_{n}_project", bp["project"]["conv"]))
        out += bn(f"block_{n}_project_BN", bp["project"]["bn"], bs["project"]["bn"])
        n += 1
    return out


def test_mobilenetv2_h5_import(tmp_path):
    model = build_detector("mobilenetv2x75", num_classes=3)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    body_p = jax.device_get(v["params"]["body"])
    body_s = jax.device_get(v["batch_stats"]["body"])

    layers = _keras_mnv2_layers(body_p, body_s)
    path = str(tmp_path / "mnv2.h5")
    fill = {}
    with h5py.File(path, "w") as f:
        for i, (layer, wname, shape) in enumerate(layers):
            val = np.full(shape, float(i + 1), np.float32)
            fill[(layer, wname)] = val
            f.create_dataset(f"{layer}/{layer}/{wname}:0", data=val)

    new_vars = load_backbone_weights(v, path, "mobilenetv2x75")

    # stem conv got layer 0's constant
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["body"]["stem"]["conv"]["kernel"]), 1.0
    )
    # depthwise kernels transposed into Flax grouped layout
    dw = np.asarray(new_vars["params"]["body"]["block_1"]["depthwise"]["dwconv"]["kernel"])
    assert dw.shape[2] == 1 and dw.shape[3] > 1
    # BN stats landed in batch_stats
    got = np.asarray(new_vars["batch_stats"]["body"]["stem"]["bn"]["mean"])
    expect = fill[("bn_Conv1", "moving_mean")]
    np.testing.assert_allclose(got, expect)
    # neck/head untouched
    for a, b in zip(
        jax.tree.leaves(v["params"]["neck"]), jax.tree.leaves(new_vars["params"]["neck"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mobilenetv2_h5_shape_mismatch_raises(tmp_path):
    model = build_detector("mobilenetv2x75", num_classes=3)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    path = str(tmp_path / "bad.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("Conv1/Conv1/kernel:0", data=np.zeros((3, 3, 3, 999), np.float32))
    with pytest.raises(ValueError, match="shape mismatch"):
        load_backbone_weights(v, path, "mobilenetv2x75")


def test_efficientnet_h5_import(tmp_path):
    model = build_detector("efficientnetb0", num_classes=3)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    body_p = jax.device_get(v["params"]["body"])
    body_s = jax.device_get(v["batch_stats"]["body"])

    # rebuild qubvel's positional naming in OUR definition order
    conv_i = dw_i = bn_i = 0
    entries = []

    def name(prefix, i):
        return prefix if i == 0 else f"{prefix}_{i}"

    def conv(p, bias=False):
        nonlocal conv_i
        n = name("conv2d", conv_i)
        conv_i += 1
        entries.append((n, "kernel", tuple(p["kernel"].shape)))
        if bias:
            entries.append((n, "bias", tuple(p["bias"].shape)))

    def dw(p):
        nonlocal dw_i
        n = name("depthwise_conv2d", dw_i)
        dw_i += 1
        k = p["kernel"].shape
        entries.append((n, "depthwise_kernel", (k[0], k[1], k[3], k[2])))

    def bn(p, s):
        nonlocal bn_i
        n = name("batch_normalization", bn_i)
        bn_i += 1
        entries.append((n, "gamma", tuple(p["scale"].shape)))
        entries.append((n, "beta", tuple(p["bias"].shape)))
        entries.append((n, "moving_mean", tuple(s["mean"].shape)))
        entries.append((n, "moving_variance", tuple(s["var"].shape)))

    conv(body_p["stem"]["conv"])
    bn(body_p["stem"]["bn"], body_s["stem"]["bn"])
    for bname in sorted(
        (k for k in body_p if k.startswith("stage_")),
        key=lambda x: (int(x.split("_")[1]), int(x.split("_")[3])),
    ):
        bp, bs = body_p[bname], body_s[bname]
        if "expand" in bp:
            conv(bp["expand"]["conv"])
            bn(bp["expand"]["bn"], bs["expand"]["bn"])
        dw(bp["depthwise"]["dwconv"])
        bn(bp["depthwise"]["bn"], bs["depthwise"]["bn"])
        conv(bp["se"]["reduce"], bias=True)
        conv(bp["se"]["excite"], bias=True)
        conv(bp["project"]["conv"])
        bn(bp["project"]["bn"], bs["project"]["bn"])

    path = str(tmp_path / "effb0.h5")
    with h5py.File(path, "w") as f:
        for i, (layer, wname, shape) in enumerate(entries):
            f.create_dataset(
                f"{layer}/{layer}/{wname}:0",
                data=np.full(shape, float(i + 1), np.float32),
            )

    new_vars = load_backbone_weights(v, path, "efficientnetb0")
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["body"]["stem"]["conv"]["kernel"]), 1.0
    )
    # first stage has no expand conv; its depthwise comes right after stem
    s0 = new_vars["params"]["body"]["stage_0_block_0"]
    assert float(np.asarray(s0["depthwise"]["dwconv"]["kernel"]).ravel()[0]) > 1.0
    # SE convs carry bias
    assert "bias" in s0["se"]["reduce"]


def test_predictor_prefers_ema_weights(tmp_path):
    """Predictor(use_ema=True) loads ema_params when the checkpoint has
    them (reference EMA decay 0.9999, yolo3/train.py:42-45)."""
    import jax
    import jax.numpy as jnp

    from yoloret_tpu.infer import Predictor
    from yoloret_tpu.utils.checkpoint import save_params

    m_anchors = np.full((9, 2), 16.0, np.float32)
    # build tiny detector weights, with ema = params * 2
    from yoloret_tpu.nn import build_detector

    det = build_detector("mobilenetv2x75", num_classes=1)
    v = det.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    ema = jax.tree.map(lambda x: x * 2.0, v["params"])
    path = str(tmp_path / "w")
    save_params(path, {"params": v["params"], "batch_stats": v["batch_stats"],
                       "ema_params": ema})

    p_raw = Predictor(class_names=["a"], anchors=m_anchors, input_hw=(64, 64),
                      weights=path, use_ema=False, bf16=False)
    p_ema = Predictor(class_names=["a"], anchors=m_anchors, input_hw=(64, 64),
                      weights=path, use_ema=True, bf16=False)
    k_raw = np.asarray(
        p_raw.variables["params"]["body"]["stem"]["conv"]["kernel"])
    k_ema = np.asarray(
        p_ema.variables["params"]["body"]["stem"]["conv"]["kernel"])
    np.testing.assert_allclose(k_ema, k_raw * 2.0, rtol=1e-6)
