"""int8 weight quantization round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.export.quantize import dequantize_tree, quantize_tree


def test_round_trip_error_bounded(rng):
    params = {
        "conv": {"kernel": rng.randn(3, 3, 16, 32).astype(np.float32)},
        "bn": {"scale": rng.randn(32).astype(np.float32)},
        "tiny": {"kernel": rng.randn(2, 4).astype(np.float32)},  # < min_size
    }
    q, stats = quantize_tree(params, min_size=128)
    assert stats["quantized"] == 1 and stats["kept"] == 2
    assert q["conv"]["kernel"]["q"].dtype == np.int8
    deq = dequantize_tree(q)
    k0, k1 = params["conv"]["kernel"], np.asarray(deq["conv"]["kernel"])
    # symmetric int8: error bounded by scale/2 per channel
    scale = np.abs(k0.reshape(-1, 32)).max(axis=0) / 127.0
    assert np.all(np.abs(k0 - k1) <= scale / 2 + 1e-7)
    # non-kernel leaves untouched
    np.testing.assert_array_equal(np.asarray(deq["bn"]["scale"]), params["bn"]["scale"])
    np.testing.assert_array_equal(np.asarray(deq["tiny"]["kernel"]), params["tiny"]["kernel"])


def test_compression_ratio(rng):
    params = {"k": {"kernel": rng.randn(5, 5, 64, 64).astype(np.float32)}}
    _, stats = quantize_tree(params)
    assert stats["bytes_fp"] / stats["bytes_q"] > 3.5


def test_detector_outputs_close_after_quant():
    from yoloret_tpu.nn import build_detector

    m = build_detector("mobilenetv2x75", num_classes=2)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3).astype(jnp.float32)
    _, mut = m.apply(v, x, True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(1)})
    vars_bn = {"params": v["params"], "batch_stats": mut["batch_stats"]}
    y0 = m.apply(vars_bn, x, False)

    q, _ = quantize_tree(jax.device_get(v["params"]))
    deq = dequantize_tree(q)
    y1 = m.apply({"params": deq, "batch_stats": mut["batch_stats"]}, x, False)
    for a, b in zip(y0, y1):
        denom = float(jnp.abs(a).mean()) + 1e-9
        assert float(jnp.abs(a - b).mean()) / denom < 0.15
