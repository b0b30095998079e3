"""Golden-value regression tests for the model graph (SURVEY §4:
fixed seed, tiny input, pinned statistics). Catches silent numeric
drift in the backbone/RFCR/neck composition.

Note: raw eval-mode outputs at init are near zero — fan-out conv init
plus identity BN running stats (the reference's regime too); goldens
are taken AFTER one BatchNorm statistics update pass.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.nn import build_detector

# (mean, std) per scale captured at jax 0.8/flax 0.12 on CPU f32.
GOLDEN = [
    (-0.000567, 0.004013),
    (8.6e-05, 0.004055),
    (0.000153, 0.003009),
]


def test_detector_golden_statistics():
    m = build_detector("mobilenetv2x75", num_classes=4)
    v = m.init(jax.random.PRNGKey(42), jnp.zeros((2, 64, 64, 3)), False)
    x = jnp.asarray(
        np.linspace(0, 1, 2 * 64 * 64 * 3, dtype=np.float32).reshape(2, 64, 64, 3)
    )
    _, mut = m.apply(
        v, x, True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)}
    )
    ys = m.apply({"params": v["params"], "batch_stats": mut["batch_stats"]}, x, False)
    for y, (gm, gs) in zip(ys, GOLDEN):
        a = np.asarray(y)
        assert float(a.mean()) == pytest.approx(gm, abs=5e-5)
        assert float(a.std()) == pytest.approx(gs, abs=5e-4)


def test_train_mode_activations_healthy():
    """Init-time train-mode activations stay O(1) through the backbone —
    guards against variance collapse/explosion regressions."""
    from yoloret_tpu.nn import MobileNetV2

    m = MobileNetV2(alpha=0.75)
    v = m.init(jax.random.PRNGKey(42), jnp.zeros((2, 64, 64, 3)), False)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    f, _ = m.apply(v, x, True, mutable=["batch_stats"])
    for k, t in f.items():
        mag = float(jnp.abs(t).mean())
        assert 0.1 < mag < 10.0, (k, mag)
