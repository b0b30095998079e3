"""Tests for the Flax model zoo: backbones, RFCR, neck, full detector."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.nn import (
    EfficientNet,
    MobileNetV2,
    RFCR,
    WeightedSum,
    YoloReT,
    build_detector,
    decode_block_args,
    make_divisible,
    round_filters,
    round_repeats,
)


def test_make_divisible():
    # Values from the reference's channel rounding (code/yolo3/model.py:32-39).
    assert make_divisible(32 * 0.75, 8) == 24
    assert make_divisible(24 * 0.75, 8) == 24  # 18 rounds up via the 10% rule
    assert make_divisible(96 * 0.75, 8) == 72
    assert make_divisible(160 * 0.75, 8) == 120
    assert make_divisible(32 * 1.4, 8) == 48


def test_round_filters_repeats_b3():
    # B3: width 1.2 / depth 1.4 (reference efficientnet.py:361-372).
    assert round_filters(16, 1.2) == 24
    assert round_filters(24, 1.2) == 32
    assert round_filters(40, 1.2) == 48
    assert round_filters(112, 1.2) == 136
    assert round_filters(192, 1.2) == 232
    assert round_repeats(1, 1.4) == 2
    assert round_repeats(4, 1.4) == 6


def test_mobilenetv2_taps():
    m = MobileNetV2(alpha=0.75)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3)), False)
    f = m.apply(v, jnp.zeros((1, 320, 320, 3)), False)
    assert f["c2"].shape == (1, 80, 80, 24)
    assert f["c3"].shape == (1, 40, 40, 24)
    assert f["c4"].shape == (1, 20, 20, 72)
    assert f["c5"].shape == (1, 10, 10, 120)


def test_efficientnet_b3_taps():
    m = EfficientNet(variant="b3")
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 320, 320, 3)), False)
    f = m.apply(v, jnp.zeros((1, 320, 320, 3)), False)
    # Channels match the reference add_2/add_4/add_12/add_17 taps.
    assert f["c2"].shape == (1, 80, 80, 32)
    assert f["c3"].shape == (1, 40, 40, 48)
    assert f["c4"].shape == (1, 20, 20, 136)
    assert f["c5"].shape == (1, 10, 10, 232)


def test_b3_stage_table():
    stages, dropout = decode_block_args("b3")
    assert [s.num_repeat for s in stages] == [2, 3, 3, 5, 5, 6, 2]
    assert [s.output_filters for s in stages] == [24, 32, 48, 96, 136, 232, 384]
    assert dropout == 0.3


def test_weighted_sum():
    ws = WeightedSum(4)
    xs = [jnp.full((1, 2, 2, 3), float(i)) for i in range(4)]
    v = ws.init(jax.random.PRNGKey(0), xs)
    # Init is all-ones (reference model.py:124-130) -> plain sum.
    np.testing.assert_allclose(ws.apply(v, xs), sum(xs))
    v2 = {"params": {"alpha": jnp.asarray([0.0, 1.0, 2.0, 3.0])}}
    np.testing.assert_allclose(ws.apply(v2, xs), xs[1] + 2 * xs[2] + 3 * xs[3])


def test_rfcr_shapes():
    m = RFCR()
    b1 = jnp.zeros((2, 10, 10, 120))
    b2 = jnp.zeros((2, 20, 20, 72))
    b3 = jnp.zeros((2, 40, 40, 24))
    b4 = jnp.zeros((2, 20, 20, 24))
    v = m.init(jax.random.PRNGKey(0), b1, b2, b3, b4, False)
    o1, o2, o3 = m.apply(v, b1, b2, b3, b4, False)
    # Redistribution concatenates the fused 96ch map onto each input.
    assert o1.shape == (2, 10, 10, 120 + 96)
    assert o2.shape == (2, 20, 20, 72 + 96)
    assert o3.shape == (2, 40, 40, 24 + 96)


@pytest.mark.parametrize(
    "backbone,size,classes",
    [("mobilenetv2x75", 320, 20), ("mobilenetv2x14", 224, 80), ("efficientnetb0", 416, 80)],
)
def test_detector_output_shapes(backbone, size, classes):
    m = build_detector(backbone, num_classes=classes)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), False)
    y1, y2, y3 = m.apply(v, jnp.zeros((2, size, size, 3)), False)
    assert y1.shape == (2, size // 32, size // 32, 3, 5 + classes)
    assert y2.shape == (2, size // 16, size // 16, 3, 5 + classes)
    assert y3.shape == (2, size // 8, size // 8, 3, 5 + classes)


def test_darknet53_taps():
    from yoloret_tpu.nn.darknet import DarkNet53

    m = DarkNet53()
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), False)
    f = m.apply(v, jnp.zeros((1, 128, 128, 3)), False)
    assert f["c2"].shape == (1, 32, 32, 128)
    assert f["c3"].shape == (1, 16, 16, 256)
    assert f["c4"].shape == (1, 8, 8, 512)
    assert f["c5"].shape == (1, 4, 4, 1024)


def test_darknet53_detector_builds():
    m = build_detector("darknet53", num_classes=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), False)
    ys = m.apply(v, jnp.zeros((1, 96, 96, 3)), False)
    assert ys[0].shape == (1, 3, 3, 3, 7)


def test_detector_jit_and_grad():
    m = build_detector("mobilenetv2x75", num_classes=4)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    v = m.init(jax.random.PRNGKey(0), x, False)

    @jax.jit
    def loss_fn(params):
        ys = m.apply({"params": params, "batch_stats": v["batch_stats"]}, x, False)
        return sum(jnp.sum(y**2) for y in ys)

    g = jax.grad(loss_fn)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    # RFCR fusion weights must receive gradient (they gate all 4 taps).
    ga = g["rfcr"]["fuse_weights"]["alpha"]
    assert np.any(np.abs(ga) > 0)


def test_detector_train_mode_updates_bn():
    m = build_detector("mobilenetv2x75", num_classes=4)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    _, mut = m.apply(
        v, x, True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)}
    )
    before = jax.tree.leaves(v["batch_stats"])
    after = jax.tree.leaves(mut["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_bf16_compute_dtype():
    m = build_detector("mobilenetv2x75", num_classes=4, dtype=jnp.bfloat16)
    x = jnp.ones((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, False)
    # Params stay f32 masters.
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(v["params"]))
    ys = m.apply(v, x, False)
    # Outputs are promoted back to f32 for decode/loss.
    assert all(y.dtype == jnp.float32 for y in ys)
