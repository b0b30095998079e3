"""Train-step tests: loss decreases on a tiny overfit task, freezing
holds, EMA tracks, DP sharding over the 8-device CPU mesh matches the
single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from yoloret_tpu.nn import build_detector
from yoloret_tpu.ops import assign_targets_batch, true_corner_boxes
from yoloret_tpu.parallel import batch_sharding, make_mesh, replicate
from yoloret_tpu.train import (
    StepConfig,
    TrainState,
    backbone_freeze_mask,
    cosine_lr_schedule,
    make_frozen_optimizer,
    train_step,
    eval_step,
)
from functools import partial

ANCHORS = (
    (10, 13), (16, 30), (33, 23), (30, 61), (62, 45),
    (59, 119), (116, 90), (156, 198), (373, 326),
)
NC = 4
SIZE = 64


def _batch(batch=2, seed=0):
    rng = np.random.RandomState(seed)
    boxes = np.zeros((batch, 20, 5), np.float32)
    boxes[:, 0, :4] = [8, 8, 40, 40]
    boxes[:, 0, 4] = 1
    anchors = np.asarray(ANCHORS, np.float32)
    y0, y1, y2 = assign_targets_batch(jnp.asarray(boxes), (SIZE, SIZE), anchors, NC)
    gt, valid = true_corner_boxes(jnp.asarray(boxes), (SIZE, SIZE))
    return {
        "images": jnp.asarray(rng.rand(batch, SIZE, SIZE, 3).astype(np.float32)),
        "y_true_0": y0,
        "y_true_1": y1,
        "y_true_2": y2,
        "gt_boxes": gt,
        "gt_valid": valid,
    }


def _state(use_ema=False, freeze=False, lr=1e-3):
    model = build_detector("mobilenetv2x75", num_classes=NC)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), False)
    base = optax.adam(lr, eps=1e-8)
    if freeze:
        tx = make_frozen_optimizer(base, backbone_freeze_mask(v["params"]))
    else:
        tx = base
    return TrainState.create(model.apply, v["params"], v["batch_stats"], tx, use_ema=use_ema)


def test_overfit_loss_decreases():
    state = _state()
    cfg = StepConfig(anchors=ANCHORS)
    batch = _batch()
    step = jax.jit(partial(train_step, cfg=cfg))
    rng = jax.random.PRNGKey(0)
    state, m0 = step(state, batch, rng)
    first = float(m0["loss"])
    for _ in range(14):
        state, m = step(state, batch, rng)
    last = float(m["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    # 15 Adam steps on a fixed 2-image batch: steady descent (the full
    # overfit-to-zero check lives in the e2e training test).
    assert last < first * 0.85, (first, last)


def test_frozen_backbone_params_unchanged():
    state = _state(freeze=True)
    cfg = StepConfig(anchors=ANCHORS, backbone_train=False)
    batch = _batch()
    before = jax.tree.map(np.asarray, state.params["body"])
    before_stats = jax.tree.map(np.asarray, state.batch_stats["body"])
    step = jax.jit(partial(train_step, cfg=cfg))
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    after = jax.tree.map(np.asarray, state.params["body"])
    after_stats = jax.tree.map(np.asarray, state.batch_stats["body"])
    for b, a in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(b, a)
    # frozen backbone BN must not update running stats either
    for b, a in zip(jax.tree.leaves(before_stats), jax.tree.leaves(after_stats)):
        np.testing.assert_array_equal(b, a)
    # but the neck must train
    neck_before = jax.tree.leaves(jax.tree.map(np.asarray, state.params["neck"]))
    assert any(np.any(x != 0) for x in neck_before)


def test_ema_tracks_params():
    state = _state(use_ema=True)
    cfg = StepConfig(anchors=ANCHORS, ema_decay=0.5)
    batch = _batch()
    step = jax.jit(partial(train_step, cfg=cfg))
    p0 = jax.tree.map(np.asarray, state.params)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    # warmed-up decay at step 0: d = min(0.5, (1+0)/(10+0)) = 0.1
    expect = jax.tree.map(lambda o, n: 0.1 * o + 0.9 * np.asarray(n), p0, state.params)
    for e, g in zip(jax.tree.leaves(expect), jax.tree.leaves(state.ema_params)):
        np.testing.assert_allclose(e, np.asarray(g), rtol=1e-5, atol=1e-7)


def test_adversarial_step_runs():
    state = _state()
    cfg = StepConfig(anchors=ANCHORS, use_adv=True)
    batch = _batch()
    step = jax.jit(partial(train_step, cfg=cfg))
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_total"]))
    assert float(m["loss_total"]) > float(m["loss"])  # adv term adds loss


def test_eval_step():
    state = _state()
    cfg = StepConfig(anchors=ANCHORS)
    m = jax.jit(partial(eval_step, cfg=cfg))(state, _batch())
    assert np.isfinite(float(m["val_loss"]))


def test_cosine_schedule():
    sched = cosine_lr_schedule(1e-3, epochs=10, steps_per_epoch=5)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(4)) == pytest.approx(1e-3)  # same epoch
    assert float(sched(25)) == pytest.approx(1e-3 * 0.5, rel=1e-5)  # epoch 5
    assert float(sched(50)) == pytest.approx(0.0, abs=1e-9)


def test_dp_sharded_step_matches_single_device():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = StepConfig(anchors=ANCHORS)
    batch = _batch(batch=8, seed=3)

    s1 = _state()
    single = jax.jit(partial(train_step, cfg=cfg))
    s1, m1 = single(s1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(jax.devices()[:8])
    data, repl = batch_sharding(mesh), replicate(mesh)
    s2 = _state()
    s2 = jax.tree.map(lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, s2)
    sharded_batch = jax.tree.map(lambda x: jax.device_put(x, data), batch)
    dp = jax.jit(partial(train_step, cfg=cfg), in_shardings=(repl, data, repl), out_shardings=(repl, repl))
    s2, m2 = dp(s2, sharded_batch, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    # updated parameters agree between the single and 8-way DP step
    l1 = jax.tree.leaves(s1.params["neck"])
    l2 = jax.tree.leaves(s2.params["neck"])
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) for a, b in zip(l1, l2))
    assert worst < 5e-3, worst


def test_spatial_sharded_train_step_matches_single_device():
    """dp x sp TRAINING: batch over ``data`` AND image height over
    ``model`` (GSPMD inserts the conv halo exchanges in forward AND
    backward). Beyond the reference, which is DP-only (SURVEY 2.3);
    the dryrun covers the sp forward, this covers the sp train step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from yoloret_tpu.parallel import spatial_sharding

    cfg = StepConfig(anchors=ANCHORS)
    batch = _batch(batch=4, seed=3)

    s1 = _state()
    single = jax.jit(partial(train_step, cfg=cfg))
    s1, m1 = single(s1, batch, jax.random.PRNGKey(0))

    mesh = make_mesh(jax.devices()[:8], data=4, model=2)
    data, repl = batch_sharding(mesh), replicate(mesh)
    sp = spatial_sharding(mesh)
    shardings = {k: (sp if k == "images" else data) for k in batch}
    s2 = _state()
    s2 = jax.tree.map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, s2)
    sharded = {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
    step = jax.jit(partial(train_step, cfg=cfg),
                   in_shardings=(repl, shardings, repl),
                   out_shardings=(repl, repl))
    s2, m2 = step(s2, sharded, jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    l1 = jax.tree.leaves(s1.params["neck"])
    l2 = jax.tree.leaves(s2.params["neck"])
    worst = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                for a, b in zip(l1, l2))
    assert worst < 5e-3, worst
