"""Loss-function tests: oracle checks vs hand-computed values and
behavioral invariants (perfect prediction -> small loss, ignore mask)."""

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.ops import assign_targets_batch, true_corner_boxes
from yoloret_tpu.train import yolo_loss, yolo_loss_per_scale

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]],
    np.float32,
)


def _perfect_logits(y_true, anchors, grid_step, big=12.0):
    """Build raw logits that decode ~exactly to y_true's boxes."""
    gh, gw = y_true.shape[1], y_true.shape[2]
    input_wh = np.array([gw * grid_step, gh * grid_step], np.float32)
    out = np.zeros_like(y_true)
    grid_x, grid_y = np.meshgrid(np.arange(gw), np.arange(gh))
    grid = np.stack([grid_x, grid_y], -1)[:, :, None, :].astype(np.float32)

    obj = y_true[..., 4:5]
    xy = y_true[..., 0:2]
    wh = y_true[..., 2:4]
    gwh = np.array([gw, gh], np.float32)
    # invert: sigmoid(t) = xy*g - grid  -> t = logit(...)
    s = np.clip(xy * gwh - grid, 1e-4, 1 - 1e-4)
    out[..., 0:2] = np.where(obj > 0, np.log(s / (1 - s)), 0.0)
    safe_wh = np.where(obj > 0, wh, 1.0)
    t_wh = np.log(safe_wh * input_wh / anchors.reshape(1, 1, 1, -1, 2))
    out[..., 2:4] = np.where(obj > 0, t_wh, -big)  # exp(-big) ~ 0-size box
    out[..., 4:5] = np.where(obj > 0, big, -big)
    out[..., 5:] = np.where(y_true[..., 5:] > 0, big, -big)
    return jnp.asarray(out)


def _make_example(num_classes=3, size=64, t=20):
    # one box of ~anchor-6 shape (116x90) so it lands on the stride-32 scale
    boxes = np.zeros((1, t, 5), np.float32)
    boxes[0, 0] = [10, 5, 10 + 50, 5 + 40, 1]  # (x1,y1,x2,y2,cls) -> wh 50x40
    y = assign_targets_batch(jnp.asarray(boxes), (size, size), ANCHORS, num_classes)
    gt, valid = true_corner_boxes(jnp.asarray(boxes), (size, size))
    return boxes, y, gt, valid


def test_perfect_prediction_low_loss():
    nc = 3
    boxes, y_trues, gt, valid = _make_example(nc)
    total_perfect, parts = None, None
    outs = []
    for l, step in enumerate((32, 16, 8)):
        anc = ANCHORS[[6, 7, 8], :] if l == 0 else (ANCHORS[[3, 4, 5], :] if l == 1 else ANCHORS[[0, 1, 2], :])
        outs.append(_perfect_logits(np.asarray(y_trues[l]), anc, step))
    total_perfect, _ = yolo_loss(outs, y_trues, gt, valid, ANCHORS, 3)

    rng = np.random.RandomState(0)
    bad = [jnp.asarray(rng.randn(*o.shape).astype(np.float32)) for o in outs]
    total_bad, _ = yolo_loss(bad, y_trues, gt, valid, ANCHORS, 3)
    assert float(total_perfect) < 0.05
    assert float(total_bad) > float(total_perfect) * 10


def test_ignore_mask_suppresses_high_iou_negatives():
    nc = 1
    boxes, y_trues, gt, valid = _make_example(nc)
    # the 50x40 box best-matches anchor 4 -> middle scale (stride 16)
    y1 = np.asarray(y_trues[1])
    pos = np.argwhere(y1[..., 4] > 0)
    assert len(pos) == 1
    b, gj, gi, k = pos[0]

    out = np.zeros_like(y1)
    # a confident prediction in a NEIGHBOR anchor slot decoding to ~the GT box
    anc = ANCHORS[[3, 4, 5], :]
    k2 = (k + 1) % 3
    wh = y1[b, gj, gi, k, 2:4]
    gh, gw = y1.shape[1], y1.shape[2]
    out[b, gj, gi, k2, 2:4] = np.log(wh * 64 / anc[k2])
    s = np.clip(y1[b, gj, gi, k, 0:2] * np.array([gw, gh]) - np.array([gi, gj]), 1e-4, 1 - 1e-4)
    out[b, gj, gi, k2, 0:2] = np.log(s / (1 - s))  # decode to the GT center
    out[b, gj, gi, k2, 4] = 5.0  # confident objectness

    l_with = yolo_loss_per_scale(
        jnp.asarray(out), y_trues[1], gt, valid, anc, 16, ignore_thresh=0.5
    )
    # same prediction but GT removed -> it becomes a penalized false positive
    l_without = yolo_loss_per_scale(
        jnp.asarray(out), y_trues[1] * 0, gt * 0, valid & False, anc, 16, ignore_thresh=0.5
    )
    assert float(l_without.confidence) > float(l_with.confidence) + 1.0


def test_loss_is_differentiable_and_finite():
    nc = 2
    _, y_trues, gt, valid = _make_example(nc)

    rng = np.random.RandomState(1)
    outs = [jnp.asarray(rng.randn(*np.asarray(y).shape).astype(np.float32) * 0.1) for y in y_trues]

    def f(outs):
        total, _ = yolo_loss(outs, y_trues, gt, valid, ANCHORS, 3)
        return total

    val, grads = jax.value_and_grad(f)(outs)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_mse_branch_runs():
    nc = 2
    _, y_trues, gt, valid = _make_example(nc)
    rng = np.random.RandomState(2)
    outs = [jnp.asarray(rng.randn(*np.asarray(y).shape).astype(np.float32) * 0.1) for y in y_trues]
    total, parts = yolo_loss(outs, y_trues, gt, valid, ANCHORS, 3, box_loss="mse")
    assert np.isfinite(float(total))
    assert len(parts) == 3


def test_batch_normalization_by_batch_size():
    nc = 2
    boxes, y_trues, gt, valid = _make_example(nc)
    rng = np.random.RandomState(3)
    outs = [jnp.asarray(rng.randn(*np.asarray(y).shape).astype(np.float32) * 0.1) for y in y_trues]
    t1, _ = yolo_loss(outs, y_trues, gt, valid, ANCHORS, 3)
    # duplicating the batch must keep the per-image loss identical
    outs2 = [jnp.concatenate([o, o]) for o in outs]
    y2 = [jnp.concatenate([y, y]) for y in y_trues]
    t2, _ = yolo_loss(outs2, y2, jnp.concatenate([gt, gt]), jnp.concatenate([valid, valid]), ANCHORS, 3)
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-5)
