"""Backbone rematerialization (--remat / build_detector(remat=True)).

jax.checkpoint trades backbone activation residency for recompute — the
TPU-memory lever the reference never had (it OOM-tuned batch size by
hand). These tests prove the lifted transform is semantically inert:
identical parameter trees, losses, gradients, and BN-stat updates.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from yoloret_tpu.nn import build_detector


def _grads(backbone, remat, x):
    m = build_detector(backbone, num_classes=3, remat=remat)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, *x.shape[1:])), False)

    def f(params, stats):
        outs, new = m.apply(
            {"params": params, "batch_stats": stats}, x, True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs), new

    (loss, new_stats), g = jax.value_and_grad(f, has_aux=True)(
        v["params"], v["batch_stats"])
    return v["params"], float(loss), g, new_stats


@pytest.mark.parametrize("backbone", ["mobilenetv2x75", "efficientnetb0"])
def test_remat_grads_match_stock(backbone, rng):
    x = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
    p0, l0, g0, n0 = _grads(backbone, False, x)
    p1, l1, g1, n1 = _grads(backbone, True, x)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)
    assert l0 == pytest.approx(l1, rel=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        g0, g1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6), n0, n1)
