"""Legacy model-zoo equivalents (reference model_computations.py):
YOLO-Nano (full pipeline), SkyNet (standalone), scarf concat fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn import build_detector
from yoloret_tpu.nn.legacy import SkyNet, YoloNano, space_to_depth
from yoloret_tpu.nn.rfcr import RFCR


def test_yolo_nano_detector_contract():
    m = build_detector("yolo_nano", num_classes=4)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), False)
    ys = m.apply(v, jnp.zeros((2, 128, 128, 3)), False)
    assert ys[0].shape == (2, 4, 4, 3, 9)
    assert ys[1].shape == (2, 8, 8, 3, 9)
    assert ys[2].shape == (2, 16, 16, 3, 9)
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert 1.5e6 < n < 3.5e6  # YOLO-Nano is a ~2-3M-param model


def test_yolo_nano_trains():
    m = build_detector("yolo_nano", num_classes=2)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    v = m.init(jax.random.PRNGKey(0), x, False)

    def loss(p):
        ys = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x, False)
        return sum(jnp.sum(y**2) for y in ys)

    g = jax.grad(loss)(v["params"])
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))


def test_yolo_fastest_detector_contract():
    """Intended Yolo-Fastest body (reference darknet.py:134-190 sketch,
    completed): standard /32,/16,/8 pyramid, tiny parameter count."""
    m = build_detector("yolo_fastest", num_classes=20)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), False)
    ys = m.apply(v, jnp.zeros((2, 128, 128, 3)), False)
    assert ys[0].shape == (2, 4, 4, 3, 25)
    assert ys[1].shape == (2, 8, 8, 3, 25)
    assert ys[2].shape == (2, 16, 16, 3, 25)
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n < 6e5, n  # "fastest": a few hundred K params

    # xl variant is wider but same contract
    mx = build_detector("yolo_fastest_xl", num_classes=20)
    vx = mx.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), False)
    yx = mx.apply(vx, jnp.zeros((1, 128, 128, 3)), False)
    assert yx[0].shape == (1, 4, 4, 3, 25)
    nx = sum(x.size for x in jax.tree.leaves(vx["params"]))
    assert nx > n


def test_yolo_fastest_trains():
    m = build_detector("yolo_fastest", num_classes=2)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    v = m.init(jax.random.PRNGKey(0), x, False)

    def loss(p):
        ys = m.apply({"params": p, "batch_stats": v["batch_stats"]}, x, False)
        return sum(jnp.sum(y**2) for y in ys)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    # the expand/depthwise path must receive gradient (the reference
    # sketch's dead-path bug would leave these zero)
    gb = g["body"]["block_0"]
    assert float(sum(np.abs(l).sum() for l in jax.tree.leaves(gb["depthwise"]))) > 0


def test_space_to_depth():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = space_to_depth(x)
    assert y.shape == (1, 2, 2, 4)
    # 2x2 block (0,0) contains pixels (0,0),(0,1),(1,0),(1,1) = 0,1,4,5
    np.testing.assert_array_equal(np.asarray(y[0, 0, 0]), [0, 1, 4, 5])


def test_skynet_single_scale():
    s = SkyNet(num_classes=1)
    v = s.init(jax.random.PRNGKey(0), jnp.zeros((1, 160, 320, 3)), False)
    y = s.apply(v, jnp.zeros((1, 160, 320, 3)), False)
    assert y.shape == (1, 20, 40, 3, 6)  # /8, rectangular ok


def test_rfcr_concat_fusion():
    r = RFCR(fusion="concat")
    args = (
        jnp.zeros((1, 8, 8, 32)), jnp.zeros((1, 16, 16, 24)),
        jnp.zeros((1, 32, 32, 16)), jnp.zeros((1, 16, 16, 8)),
    )
    v = r.init(jax.random.PRNGKey(0), *args, False)
    # concat fusion has no WeightedSum alpha parameter
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    names = {"/".join(str(k) for k in p) for p, _ in flat}
    assert not any("fuse_weights" in n for n in names)
    o1, o2, o3 = r.apply(v, *args, False)
    assert o1.shape[-1] == 32 + 96
