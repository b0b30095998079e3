"""Fused Pallas NMS kernel vs the lax reference implementation
(interpret mode on CPU; the compiled kernel runs on real TPU only)."""

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.ops.nms import class_aware_nms
from yoloret_tpu.ops.nms_pallas import fused_result, nms_fused


def _problem(rng, b=2, n=600, c=4):
    boxes = rng.rand(b, n, 4).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.rand(b, n, 2).astype(np.float32) * 0.3
    scores = rng.rand(b, n, c).astype(np.float32)
    return boxes, scores


def _candidates(boxes, scores, k):
    cls_scores, cls_idx = jax.lax.top_k(jnp.asarray(scores).transpose(0, 2, 1), k)
    c = scores.shape[-1]
    cls_boxes = jnp.take_along_axis(
        jnp.asarray(boxes)[:, None].repeat(c, 1), cls_idx[..., None], axis=2
    )
    return cls_boxes, cls_scores


def test_fused_matches_lax(rng):
    boxes, scores = _problem(rng)
    k = 128
    cls_boxes, cls_scores = _candidates(boxes, scores, k)
    fb, fs = nms_fused(
        cls_boxes, cls_scores, max_det_per_class=10,
        iou_threshold=0.5, score_threshold=0.3, interpret=True,
    )
    res = fused_result(fb, fs)
    for b in range(boxes.shape[0]):
        r = class_aware_nms(
            jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
            max_det_per_class=10, iou_threshold=0.5, score_threshold=0.3,
            num_candidates=k, approx_topk=False,
        )
        lv = np.asarray(r.valid)
        fv = np.asarray(res.valid[b])
        ls, fs_ = np.asarray(r.scores)[lv], np.asarray(res.scores[b])[fv]
        lb, fb_ = np.asarray(r.boxes)[lv], np.asarray(res.boxes[b])[fv]
        assert len(ls) == len(fs_)
        o1, o2 = np.argsort(-ls), np.argsort(-fs_)
        np.testing.assert_allclose(ls[o1], fs_[o2], rtol=1e-5)
        np.testing.assert_allclose(lb[o1], fb_[o2], rtol=1e-5)


def test_fused_respects_score_threshold(rng):
    boxes, scores = _problem(rng, b=1, n=100, c=2)
    scores[:] = 0.1  # everything below threshold
    cls_boxes, cls_scores = _candidates(boxes, scores, 64)
    fb, fs = nms_fused(
        cls_boxes, cls_scores, max_det_per_class=5,
        iou_threshold=0.5, score_threshold=0.5, interpret=True,
    )
    assert float(jnp.sum(fs)) == 0.0
    res = fused_result(fb, fs)
    assert not bool(jnp.any(res.valid))


def test_fused_suppresses_overlaps(rng):
    # two near-identical high boxes + one distant: expect 2 survivors
    boxes = np.zeros((1, 3, 4), np.float32)
    boxes[0, 0] = [0.1, 0.1, 0.5, 0.5]
    boxes[0, 1] = [0.11, 0.11, 0.51, 0.51]  # IoU ~0.9 with box 0
    boxes[0, 2] = [0.6, 0.6, 0.9, 0.9]
    scores = np.array([[[0.9], [0.8], [0.7]]], np.float32)
    cls_boxes, cls_scores = _candidates(boxes, scores, 3)
    fb, fs = nms_fused(
        cls_boxes, cls_scores, max_det_per_class=3,
        iou_threshold=0.5, score_threshold=0.1, interpret=True,
    )
    res = fused_result(fb, fs)
    got = np.asarray(res.scores[0])[np.asarray(res.valid[0])]
    np.testing.assert_allclose(sorted(got, reverse=True), [0.9, 0.7], rtol=1e-6)


def test_fused_pads_non_aligned_candidate_pool(rng):
    """K not a multiple of 128 (e.g. the serving 64-pool) pads internally."""
    boxes, scores = _problem(rng, b=1, n=200, c=3)
    cls_boxes, cls_scores = _candidates(boxes, scores, 64)
    fb, fs = nms_fused(
        cls_boxes, cls_scores, max_det_per_class=5,
        iou_threshold=0.5, score_threshold=0.3, interpret=True,
    )
    assert fb.shape == (1, 3, 5, 4)
    res = fused_result(fb, fs)
    # matches the lax path restricted to the same 64-candidate pool
    r = class_aware_nms(
        jnp.asarray(boxes[0]), jnp.asarray(scores[0]),
        max_det_per_class=5, iou_threshold=0.5, score_threshold=0.3,
        num_candidates=64, approx_topk=False,
    )
    np.testing.assert_allclose(
        sorted(np.asarray(res.scores[0])[np.asarray(res.valid[0])]),
        sorted(np.asarray(r.scores)[np.asarray(r.valid)]),
        rtol=1e-5,
    )


def test_suppress_lax_matches_kernel(rng):
    """The batched lax suppression twin and the Pallas kernel implement
    identical greedy semantics over the same candidate pools."""
    from yoloret_tpu.ops.postprocess import _suppress_lax

    boxes, scores = _problem(rng, b=2, n=300, c=5)
    cls_boxes, cls_scores = _candidates(boxes, scores, 128)
    kb, ks = nms_fused(
        cls_boxes, cls_scores, max_det_per_class=8,
        iou_threshold=0.5, score_threshold=0.3, interpret=True,
    )
    lb, ls = _suppress_lax(
        cls_boxes, cls_scores, max_det=8,
        iou_threshold=0.5, score_threshold=0.3,
    )
    np.testing.assert_allclose(np.asarray(ls), np.asarray(ks), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(kb), rtol=1e-6)
