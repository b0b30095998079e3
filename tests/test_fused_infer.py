"""Fused-backbone inference path == stock model.apply (f32, CPU
interpret mode). BN folding + Pallas fused MBConv must reproduce the
exact detector forward the parity tests validated against Keras and the
reference."""

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.nn.fused_infer import (
    fused_detector_apply,
    mobilenetv2_fused_features,
    mobilenetv2_fused_features_v2,
)


def test_fused_features_match_stock_backbone():
    model = build_detector("mobilenetv2x75", num_classes=3)
    x = jnp.asarray(
        np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    # give the running stats non-trivial values so BN folding is exercised
    variables = jax.tree.map(lambda v: v, variables)
    stats = jax.tree.map(
        lambda v: v + 0.05 * np.random.RandomState(1).rand(*v.shape).astype(v.dtype)
        if v.ndim else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    def stock(m, xx):
        feats = m.body(xx.astype(m.dtype), False)
        return feats

    want = model.apply(variables, x, method=stock)
    got = mobilenetv2_fused_features(
        variables, x, alpha=0.75, dtype=jnp.float32, interpret=True
    )
    assert set(got) == {"c2", "c3", "c4", "c5"}
    for k in ("c2", "c3", "c4", "c5"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-4, rtol=2e-4
        )


def test_fused_features_v2_match_stock_backbone():
    model = build_detector("mobilenetv2x75", num_classes=3)
    x = jnp.asarray(
        np.random.RandomState(3).rand(2, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)
    stats = jax.tree.map(
        lambda v: v + 0.05 * np.random.RandomState(1).rand(*v.shape).astype(v.dtype)
        if v.ndim else v,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    want = model.apply(
        variables, x, method=lambda m, xx: m.body(xx.astype(m.dtype), False)
    )
    got = mobilenetv2_fused_features_v2(
        variables, x, alpha=0.75, dtype=jnp.float32, interpret=True
    )
    assert set(got) == {"c2", "c3", "c4", "c5"}
    for k in ("c2", "c3", "c4", "c5"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-4, rtol=2e-4
        )


def test_fused_detector_apply_v2_matches_stock():
    model = build_detector("mobilenetv2x75", num_classes=3)
    x = jnp.asarray(
        np.random.RandomState(4).rand(1, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, False)
    want = model.apply(variables, x, False)
    got = fused_detector_apply(model, variables, x, interpret=True,
                               version=2)
    for g, w in zip(got, want):
        assert g.shape == w.shape and g.dtype == w.dtype
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4
        )


def test_fused_detector_apply_matches_stock():
    model = build_detector("mobilenetv2x75", num_classes=3)
    x = jnp.asarray(
        np.random.RandomState(2).rand(1, 96, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, False)
    want = model.apply(variables, x, False)
    got = fused_detector_apply(model, variables, x, interpret=True)
    for g, w in zip(got, want):
        assert g.shape == w.shape and g.dtype == w.dtype
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=2e-4, rtol=2e-4
        )


def test_fused_detector_apply_falls_back_for_other_backbones():
    model = build_detector("yolo_fastest", num_classes=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    got = fused_detector_apply(model, variables, x)
    want = model.apply(variables, x, False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
