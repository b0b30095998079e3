"""Unit tests for yoloret_tpu.ops against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu import ops


# ---------------------------------------------------------------- IoU / GIoU
def np_iou(b1, b2):
    ymin = max(b1[0], b2[0])
    xmin = max(b1[1], b2[1])
    ymax = min(b1[2], b2[2])
    xmax = min(b1[3], b2[3])
    inter = max(0.0, xmax - xmin) * max(0.0, ymax - ymin)
    a1 = max(0.0, b1[2] - b1[0]) * max(0.0, b1[3] - b1[1])
    a2 = max(0.0, b2[2] - b2[0]) * max(0.0, b2[3] - b2[1])
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def test_iou_matches_oracle(rng):
    b1 = rng.rand(50, 4).astype(np.float32)
    b2 = rng.rand(50, 4).astype(np.float32)
    # make ymin<ymax, xmin<xmax
    b1 = np.concatenate([np.minimum(b1[:, :2], b1[:, 2:]), np.maximum(b1[:, :2], b1[:, 2:])], -1)
    b2 = np.concatenate([np.minimum(b2[:, :2], b2[:, 2:]), np.maximum(b2[:, :2], b2[:, 2:])], -1)
    got = np.asarray(ops.iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = np.array([np_iou(a, b) for a, b in zip(b1, b2)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_giou_range_and_identity(rng):
    b = rng.rand(20, 4).astype(np.float32)
    b = np.concatenate([np.minimum(b[:, :2], b[:, 2:]), np.maximum(b[:, :2], b[:, 2:])], -1)
    g = np.asarray(ops.giou(jnp.asarray(b), jnp.asarray(b)))
    np.testing.assert_allclose(g, np.ones(20), atol=1e-6)
    b2 = b + 10.0  # disjoint
    g2 = np.asarray(ops.giou(jnp.asarray(b), jnp.asarray(b2)))
    assert (g2 < 0).all() and (g2 >= -1).all()


def test_iou_zero_area_box():
    degenerate = jnp.asarray([0.5, 0.5, 0.5, 0.5])
    other = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    assert float(ops.iou(degenerate, degenerate)) == 0.0
    assert float(ops.iou(degenerate, other)) == 0.0


def test_wh_iou():
    a = jnp.asarray([[10.0, 10.0]])
    b = jnp.asarray([[10.0, 10.0], [5.0, 10.0], [20.0, 20.0]])
    got = np.asarray(ops.wh_iou(a, b))
    np.testing.assert_allclose(got, [1.0, 0.5, 100.0 / 400.0], rtol=1e-6)


# -------------------------------------------------------------------- decode
def test_decode_boxes_formulas(rng):
    gh, gw, a, c = 4, 6, 3, 2
    feats = rng.randn(gh, gw, a, 5 + c).astype(np.float32)
    anchors = np.array([[10, 13], [16, 30], [33, 23]], np.float32)
    input_hw = (128, 192)
    xy, wh = ops.decode_boxes(jnp.asarray(feats), anchors, input_hw)
    sig = 1 / (1 + np.exp(-feats[..., :2]))
    gx, gy = np.meshgrid(np.arange(gw), np.arange(gh))
    grid = np.stack([gx, gy], -1)[:, :, None, :]
    want_xy = (sig + grid) / np.array([gw, gh])
    want_wh = np.exp(feats[..., 2:4]) * anchors[None, None] / np.array([192, 128])
    np.testing.assert_allclose(np.asarray(xy), want_xy, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wh), want_wh, rtol=1e-5, atol=1e-5)


def test_correct_boxes_landscape_image():
    # 320x320 net, image 200(h)x400(w): letterbox content is 320x160 tall,
    # centered vertically. A box covering the full content must map back to
    # (0, 0, 200, 400).
    xy = jnp.asarray([[0.5, 0.5]])
    wh = jnp.asarray([[1.0, 0.5]])  # full width, half height (the content)
    boxes = np.asarray(ops.correct_boxes(xy, wh, (320, 320), jnp.asarray([200.0, 400.0])))
    np.testing.assert_allclose(boxes[0], [0.0, 0.0, 200.0, 400.0], atol=1e-3)


def test_correct_boxes_clip():
    xy = jnp.asarray([[0.01, 0.01]])
    wh = jnp.asarray([[0.5, 0.5]])
    boxes = np.asarray(ops.correct_boxes(xy, wh, (320, 320), jnp.asarray([100.0, 100.0])))
    assert (boxes >= 0).all()


def test_xywh_to_corners():
    xy = jnp.asarray([[0.5, 0.25]])
    wh = jnp.asarray([[0.2, 0.1]])
    got = np.asarray(ops.xywh_to_corners(xy, wh))[0]
    np.testing.assert_allclose(got, [0.2, 0.4, 0.3, 0.6], atol=1e-6)


# ----------------------------------------------------------------- letterbox
def test_letterbox_jax_shape_and_centering():
    img = jnp.ones((100, 200, 3), jnp.float32)
    out = ops.letterbox_jax(img, (320, 320))
    assert out.shape == (320, 320, 3)
    out = np.asarray(out)
    nh, nw, dy, dx = ops.letterbox_params((100, 200), (320, 320))
    assert (nh, nw, dy, dx) == (160, 320, 80, 0)
    assert out[:80].max() == 0 and out[240:].max() == 0
    np.testing.assert_allclose(out[80:240], 1.0, atol=1e-5)


# ----------------------------------------------------------------------- NMS
def np_greedy_nms(boxes, scores, iou_thr, score_thr, max_det):
    """Single-class greedy NMS oracle (tf.image.non_max_suppression rules)."""
    idx = np.argsort(-scores, kind="stable")
    keep = []
    for i in idx:
        if scores[i] < score_thr:
            continue
        if any(np_iou(boxes[i], boxes[j]) > iou_thr for j in keep):
            continue
        keep.append(i)
        if len(keep) == max_det:
            break
    return keep


def test_nms_matches_oracle(rng):
    n, c = 60, 3
    boxes = rng.rand(n, 4).astype(np.float32) * 100
    boxes = np.concatenate(
        [boxes[:, :2], boxes[:, :2] + 5 + np.abs(boxes[:, 2:]) * 0.3], axis=-1
    )
    scores = rng.rand(n, c).astype(np.float32)
    res = ops.class_aware_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        max_det_per_class=5,
        iou_threshold=0.5,
        score_threshold=0.3,
        num_candidates=n,
    )
    for cls in range(c):
        want = np_greedy_nms(boxes, scores[:, cls], 0.5, 0.3, 5)
        sel = np.asarray(res.valid) & (np.asarray(res.classes) == cls)
        got_boxes = np.asarray(res.boxes)[sel]
        got_scores = np.asarray(res.scores)[sel]
        assert len(got_boxes) == len(want), f"class {cls}"
        np.testing.assert_allclose(got_scores, scores[want, cls], rtol=1e-6)
        np.testing.assert_allclose(got_boxes, boxes[want], rtol=1e-5)


def test_nms_empty_when_all_below_threshold(rng):
    boxes = rng.rand(10, 4).astype(np.float32)
    scores = np.full((10, 2), 0.1, np.float32)
    res = ops.class_aware_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_threshold=0.6
    )
    assert not bool(np.asarray(res.valid).any())


def test_nms_batched(rng):
    b, n, c = 4, 30, 2
    boxes = rng.rand(b, n, 4).astype(np.float32) * 50
    boxes = np.concatenate([boxes[..., :2], boxes[..., :2] + 3], axis=-1)
    scores = rng.rand(b, n, c).astype(np.float32)
    fn = jax.vmap(
        lambda bx, sc: ops.class_aware_nms(
            bx, sc, max_det_per_class=4, score_threshold=0.2, num_candidates=n
        )
    )
    res = fn(jnp.asarray(boxes), jnp.asarray(scores))
    assert res.boxes.shape == (b, c * 4, 4)
    # spot-check one element vs unbatched
    single = ops.class_aware_nms(
        jnp.asarray(boxes[1]),
        jnp.asarray(scores[1]),
        max_det_per_class=4,
        score_threshold=0.2,
        num_candidates=n,
    )
    np.testing.assert_allclose(np.asarray(res.boxes)[1], np.asarray(single.boxes))


# ---------------------------------------------------------- target assignment
def np_assign_targets(boxes, input_hw, anchors, num_classes, num_scales):
    """Numpy oracle re-deriving the reference preprocess_true_boxes contract
    (code/yolo3/utils.py:298-376)."""
    h, w = input_hw
    masks = [[6, 7, 8], [3, 4, 5], [0, 1, 2]][-num_scales:]
    steps = [32, 16, 8]
    grids = [
        np.zeros((h // steps[l], w // steps[l], 3, 5 + num_classes), np.float32)
        for l in range(num_scales)
    ]
    for x1, y1, x2, y2, cls in boxes:
        bw, bh = x2 - x1, y2 - y1
        if bw <= 0:
            continue
        cx = np.floor((x1 + x2) / 2.0) / w
        cy = np.floor((y1 + y2) / 2.0) / h
        ious = []
        for aw, ah in anchors:
            inter = min(bw, aw) * min(bh, ah)
            ious.append(inter / (bw * bh + aw * ah - inter))
        n = int(np.argmax(ious))
        for l in range(num_scales):
            if n in masks[l]:
                gh, gw = grids[l].shape[:2]
                i = int(np.floor(cx * gw))
                j = int(np.floor(cy * gh))
                k = masks[l].index(n)
                grids[l][j, i, k, :] = 0
                grids[l][j, i, k, 0:4] = [cx, cy, bw / w, bh / h]
                grids[l][j, i, k, 4] = 1
                grids[l][j, i, k, 5 + int(cls)] = 1
    return grids


ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]],
    np.float32,
)


@pytest.mark.parametrize("num_scales", [1, 2, 3])
def test_assign_targets_matches_oracle(rng, num_scales):
    t, c = 20, 20
    xy1 = rng.rand(t, 2) * 250
    wh = rng.rand(t, 2) * 60 + 2
    cls = rng.randint(0, c, (t, 1))
    boxes = np.concatenate([xy1, xy1 + wh, cls], -1).astype(np.float32)
    boxes[15:] = 0  # padding rows
    got = ops.assign_targets(jnp.asarray(boxes), (320, 320), ANCHORS, c, num_scales)
    want = np_assign_targets(boxes, (320, 320), ANCHORS, c, num_scales)
    assert len(got) == num_scales
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w_, atol=1e-6)


def test_assign_targets_batch(rng):
    boxes = np.zeros((3, 20, 5), np.float32)
    boxes[:, 0] = [50, 50, 150, 150, 2]
    out = ops.assign_targets_batch(jnp.asarray(boxes), (320, 320), ANCHORS, 20, 3)
    assert out[0].shape == (3, 10, 10, 3, 25)
    total_obj = sum(float(np.asarray(g[..., 4]).sum()) for g in out)
    assert total_obj == 3.0


def test_true_corner_boxes():
    boxes = np.zeros((2, 5), np.float32)
    boxes[0] = [10, 20, 110, 220, 3]
    corners, valid = ops.true_corner_boxes(jnp.asarray(boxes), (320, 320))
    np.testing.assert_allclose(
        np.asarray(corners[0]), [20 / 320, 10 / 320, 220 / 320, 110 / 320], atol=1e-6
    )
    assert bool(valid[0]) and not bool(valid[1])


# -------------------------------------------------------------- full detect
def test_detect_shapes(rng):
    c = 20
    outputs = [
        jnp.asarray(rng.randn(10, 10, 3, 5 + c).astype(np.float32)),
        jnp.asarray(rng.randn(20, 20, 3, 5 + c).astype(np.float32)),
        jnp.asarray(rng.randn(40, 40, 3, 5 + c).astype(np.float32)),
    ]
    res = ops.detect(outputs, jnp.asarray(ANCHORS), c, jnp.asarray([480.0, 640.0]),
                     score_threshold=0.2)
    assert res.boxes.shape == (c * 20, 4)
    assert res.scores.shape == (c * 20,)
    # all emitted boxes inside the image
    valid = np.asarray(res.valid)
    b = np.asarray(res.boxes)[valid]
    assert (b[:, 0] >= 0).all() and (b[:, 2] <= 480).all() and (b[:, 3] <= 640).all()


def test_detect_batch_shapes(rng):
    c, b = 4, 2
    outputs = [
        jnp.asarray(rng.randn(b, 10, 10, 3, 5 + c).astype(np.float32)),
        jnp.asarray(rng.randn(b, 20, 20, 3, 5 + c).astype(np.float32)),
        jnp.asarray(rng.randn(b, 40, 40, 3, 5 + c).astype(np.float32)),
    ]
    hw = jnp.asarray([[480.0, 640.0], [320.0, 320.0]])
    res = ops.detect_batch(outputs, jnp.asarray(ANCHORS), c, hw, score_threshold=0.2)
    assert res.boxes.shape == (b, c * 20, 4)
