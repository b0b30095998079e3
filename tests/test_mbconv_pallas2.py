"""v2 (CP-layout, double-buffered DMA) fused MBConv kernel vs the XLA
oracle, interpret mode on CPU. On-chip exactness/perf: tools/bench_fused.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.ops.mbconv_pallas import reference_mbconv
from yoloret_tpu.ops.mbconv_pallas2 import (
    cp_block_args,
    from_cp,
    fused_mbconv2,
    fused_mbconv2_cp,
    to_cp,
)


def _params(rng, cin, ce, cout, expand=True, dtype=jnp.float32):
    def r(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.2, dtype)

    we = r(cin, ce) if expand else None
    be = r(1, ce) if expand else None
    return we, be, r(3, 3, ce), r(1, ce), r(ce, cout), r(1, cout)


@pytest.mark.parametrize("case", [
    # (b, h, w, cin, ce, cout, expand, residual)
    (3, 16, 16, 8, 32, 16, True, False),
    (2, 16, 16, 16, 96, 16, True, True),    # residual
    (2, 16, 16, 24, 24, 16, False, False),  # t=1 (no expand)
    (1, 24, 20, 8, 32, 16, True, False),    # non-square, odd lane pad
    (4, 10, 10, 48, 288, 48, True, True),   # small image, wide channels
])
def test_v2_matches_xla(case):
    b, h, w, cin, ce, cout, expand, residual = case
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w, cin).astype(np.float32)) - 0.5
    we, be, wd, bd, wp, bp = _params(rng, cin, ce, cout, expand)
    got = fused_mbconv2(
        x, we, be, wd, bd, wp, bp, residual=residual, interpret=True
    )
    want = reference_mbconv(
        x, we, be, wd, bd, wp, bp, stride=1, residual=residual
    )
    assert got.shape == (b, h, w, cout)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4
    )


def test_v2_bf16():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 16, 16, 16).astype(np.float32), jnp.bfloat16)
    we, be, wd, bd, wp, bp = _params(rng, 16, 96, 16, dtype=jnp.bfloat16)
    got = fused_mbconv2(
        x, we, be, wd, bd, wp, bp, residual=True, interpret=True
    )
    want = reference_mbconv(x, we, be, wd, bd, wp, bp, residual=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_cp_roundtrip_and_chaining():
    """to_cp/from_cp round-trip, and two CP-resident blocks chained
    without intermediate NHWC conversion equal two NHWC-wrapped calls."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(2, 12, 12, 16).astype(np.float32)) - 0.5
    np.testing.assert_array_equal(
        np.asarray(from_cp(to_cp(x), x.shape)), np.asarray(x)
    )

    p1 = _params(rng, 16, 96, 16)
    p2 = _params(rng, 16, 96, 16)
    want = fused_mbconv2(x, *p1, residual=True, interpret=True)
    want = fused_mbconv2(want, *p2, residual=True, interpret=True)

    y = to_cp(x)
    for p in (p1, p2):
        y = fused_mbconv2_cp(
            y, *cp_block_args(*p, dtype=x.dtype), h=12, w=12,
            residual=True, interpret=True,
        )
    got = from_cp(y, want.shape)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )
