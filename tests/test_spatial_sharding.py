"""Spatial parallelism: images sharded over (data, model) axes of a 2-D
mesh must produce the same results as single-device execution (GSPMD
inserts conv halo exchanges)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.nn import build_detector
from yoloret_tpu.parallel import make_mesh, replicate, spatial_sharding


def test_spatial_sharded_forward_matches():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    m = build_detector("mobilenetv2x75", num_classes=4)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 128, 128, 3).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x[:1], False)

    repl = replicate(mesh)
    v_r = jax.tree.map(lambda a: jax.device_put(a, repl), v)
    fwd = jax.jit(
        lambda v, x: m.apply(v, x, False),
        in_shardings=(repl, spatial_sharding(mesh)),
        out_shardings=repl,
    )
    ys = fwd(v_r, jax.device_put(x, spatial_sharding(mesh)))
    y0 = m.apply(v, x, False)
    for a, b in zip(ys, y0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
