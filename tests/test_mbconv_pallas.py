"""Fused MBConv Pallas kernel vs XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.ops.mbconv_pallas import fused_mbconv, reference_mbconv


def _params(rng, cin, ce, cout, expand=True, dtype=jnp.float32):
    def r(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.2, dtype)

    we = r(cin, ce) if expand else None
    be = r(1, ce) if expand else None
    return we, be, r(3, 3, ce), r(1, ce), r(ce, cout), r(1, cout)


@pytest.mark.parametrize("case", [
    # (h, w, cin, ce, cout, stride, expand, residual)
    (16, 16, 8, 32, 16, 1, True, False),
    (16, 16, 16, 96, 16, 1, True, True),   # residual block
    (16, 16, 24, 24, 16, 1, False, False),  # t=1 (no expand, block 0)
    (16, 16, 8, 48, 24, 2, True, False),   # stride-2 downsample
    (32, 16, 16, 96, 24, 2, True, False),  # non-square, stride 2
    (24, 24, 8, 32, 16, 1, True, False),   # odd tiling (th reduces)
])
def test_fused_mbconv_matches_xla(case):
    h, w, cin, ce, cout, stride, expand, residual = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, h, w, cin).astype(np.float32)) - 0.5
    we, be, wd, bd, wp, bp = _params(rng, cin, ce, cout, expand)
    got = fused_mbconv(
        x, we, be, wd, bd, wp, bp,
        stride=stride, residual=residual, interpret=True,
    )
    want = reference_mbconv(
        x, we, be, wd, bd, wp, bp, stride=stride, residual=residual
    )
    assert got.shape == (2, h // stride, w // stride, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_fused_mbconv_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(1, 16, 16, 8).astype(np.float32), jnp.bfloat16)
    we, be, wd, bd, wp, bp = _params(rng, 8, 32, 16, dtype=jnp.bfloat16)
    got = fused_mbconv(x, we, be, wd, bd, wp, bp, interpret=True)
    want = reference_mbconv(x, we, be, wd, bd, wp, bp)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=0.15, rtol=0.1,
    )
