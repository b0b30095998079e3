"""Op-level numerical cross-validation against the reference's own
functions (executed read-only from /root/reference with TF present):

* target assignment vs ``preprocess_true_boxes`` (utils.py:298-376)
* per-scale training loss vs ``YoloLoss`` (model.py:585-691)
* full postprocess (decode -> letterbox inverse -> per-class NMS) vs
  ``yolo_eval`` (model.py:431-491), including the reference's native
  ``tf.image.non_max_suppression`` kernel.

These replace "numpy oracles transcribed from the reference" with the
reference itself as the oracle.
"""

import os
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp

REFERENCE = "/root/reference/code"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not present"
)

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]], np.float32,
)


def _ref_modules():
    if "neural_structured_learning" not in sys.modules:
        nsl = types.ModuleType("neural_structured_learning")
        nsl.configs = types.SimpleNamespace(make_adv_reg_config=lambda **k: None)
        nsl.keras = types.SimpleNamespace(adversarial_loss=lambda *a, **k: 0.0)
        sys.modules["neural_structured_learning"] = nsl
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import yolo3.model as ref_model
    import yolo3.utils as ref_utils

    return ref_model, ref_utils


def _boxes(rng, n, size):
    out = np.zeros((n, 5), np.float32)
    for i in range(n):
        w = rng.randint(8, size // 2)
        h = rng.randint(8, size // 2)
        x = rng.randint(0, size - w)
        y = rng.randint(0, size - h)
        out[i] = [x, y, x + w, y + h, rng.randint(0, 3)]
    return out


def test_targets_match_reference(rng):
    _, ref_utils = _ref_modules()
    from yoloret_tpu.ops import assign_targets

    size, C = 96, 3
    boxes = _boxes(rng, 6, size)
    ref_y = ref_utils.preprocess_true_boxes(
        boxes.copy(), (size, size), ANCHORS, C, 3
    )
    ours = assign_targets(jnp.asarray(boxes), (size, size), ANCHORS, C)
    for l in range(3):
        np.testing.assert_allclose(
            np.asarray(ours[l]), np.asarray(ref_y[l]), atol=1e-6,
            err_msg=f"scale {l}",
        )


def test_loss_matches_reference(rng):
    """Per-scale GIoU loss vs the reference YoloLoss on identical
    inputs. The one documented scoping deviation (parity.md: our ignore
    mask uses the per-image GT list; the reference pools THIS SCALE's
    batch positives via boolean_mask) is neutralized by feeding our
    loss exactly the reference's masked box set, so every remaining
    term — BCE, GIoU, masking, normalization — must agree."""
    ref_model, ref_utils = _ref_modules()
    from yoloret_tpu.ops.targets import anchor_masks_for
    from yoloret_tpu.train.losses import yolo_loss_per_scale

    size, C, B = 96, 3, 2
    steps = [32, 16, 8]
    y_trues = []
    for b in range(B):
        y_trues.append(ref_utils.preprocess_true_boxes(
            _boxes(rng, 5, size), (size, size), ANCHORS, C, 3))
    for l in range(3):
        g = size // steps[l]
        y_true = np.stack([y_trues[b][l] for b in range(B)])  # [B,g,g,3,5+C]
        y_pred = (rng.randn(B, g, g, 3, 5 + C) * 1.2).astype(np.float32)

        ref_loss_fn = ref_model.YoloLoss(l, ANCHORS, 3, print_loss=False)
        ref_loss = float(ref_loss_fn.call(
            tf.constant(y_true), tf.constant(y_pred)))

        # reference ignore mask: corners of THIS scale's batch positives
        obj = y_true[..., 4] > 0
        xy = y_true[..., 0:2][obj]
        wh = y_true[..., 2:4][obj]
        mins = (xy - wh / 2.0)[:, ::-1]
        maxs = (xy + wh / 2.0)[:, ::-1]
        gt = np.clip(np.concatenate([mins, maxs], -1), 0.0, 1.0)
        t = len(gt)
        if t == 0:  # scale with no positives: one invalid pad row
            # (reference reduce_max over the empty set yields -inf ->
            # ignore_mask all ones; an invalid row gives best_iou 0 ->
            # same mask)
            gt_b = np.zeros((B, 1, 4), np.float32)
            valid = np.zeros((B, 1), bool)
        else:
            gt_b = np.broadcast_to(gt, (B, t, 4)).copy()
            valid = np.ones((B, t), bool)

        ours = yolo_loss_per_scale(
            jnp.asarray(y_pred), jnp.asarray(y_true),
            jnp.asarray(gt_b), jnp.asarray(valid),
            jnp.asarray(ANCHORS[np.asarray(anchor_masks_for(3)[l])]),
            steps[l],
        )
        assert float(ours.total) == pytest.approx(ref_loss, rel=2e-5), (
            l, float(ours.total), ref_loss,
        )


def test_voc_ap_matches_reference(rng):
    """AP integration vs the reference's _voc_ap (map.py:16-32)."""
    _ref_modules()
    from yolo3.map import MAPCallback

    from yoloret_tpu.eval import voc_ap

    for _ in range(10):
        n = rng.randint(1, 30)
        rec = np.sort(rng.rand(n))
        prec = rng.rand(n)
        theirs = MAPCallback._voc_ap(None, rec.tolist(), prec.tolist())
        assert float(voc_ap(rec, prec)) == pytest.approx(float(theirs), abs=1e-9)


def test_postprocess_matches_reference_yolo_eval(rng):
    """Our fused detect() vs the reference yolo_eval (native TF NMS
    kernel included), same raw heads, exact configuration."""
    ref_model, _ = _ref_modules()
    from yoloret_tpu.ops import detect

    size, C = 96, 3
    outputs = [
        (rng.randn(1, size // s, size // s, 3, 5 + C) * 1.5).astype(np.float32)
        for s in (32, 16, 8)
    ]
    image_shape = (150, 200)
    rb, rs, rc = ref_model.yolo_eval(
        [tf.constant(o) for o in outputs], ANCHORS, 3, C,
        tf.constant(image_shape), max_boxes=10,
        score_threshold=0.3, iou_threshold=0.5,
    )
    ref = sorted(
        (int(c), round(float(s), 4), tuple(int(v) for v in b))
        for b, s, c in zip(rb.numpy(), rs.numpy(), rc.numpy())
    )

    res = detect(
        [jnp.asarray(o[0]) for o in outputs], jnp.asarray(ANCHORS), C,
        jnp.asarray(image_shape, jnp.float32),
        score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10,
        num_candidates=10**9, approx_topk=False,
    )
    got = sorted(
        (int(c), round(float(s), 4), tuple(int(v) for v in b))
        for b, s, c, v in zip(
            np.asarray(res.boxes), np.asarray(res.scores),
            np.asarray(res.classes), np.asarray(res.valid))
        if v
    )
    assert len(got) == len(ref), (len(got), len(ref))
    for (gc, gs, gb), (rc_, rs_, rb_) in zip(got, ref):
        assert gc == rc_
        assert gs == pytest.approx(rs_, abs=2e-4)
        # reference casts boxes to int32 (truncation); allow 1px
        assert all(abs(a - b) <= 1 for a, b in zip(gb, rb_)), (gb, rb_)
