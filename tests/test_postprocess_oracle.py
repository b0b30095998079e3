"""Whole-postprocess oracle: an independent pure-numpy implementation of
the reference ``yolo_eval`` math (decode -> letterbox inverse ->
per-class greedy NMS, code/yolo3/model.py:344-491) compared against the
framework's fused on-device ``detect`` on random head outputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from yoloret_tpu.ops import detect

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]], np.float32,
)
MASKS = [[6, 7, 8], [3, 4, 5], [0, 1, 2]]


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_decode_all(outputs, input_hw, image_hw):
    """boxes [N,4] (ymin,xmin,ymax,xmax) image px; scores [N,C]."""
    H, W = input_hw
    ih, iw = image_hw
    all_boxes, all_scores = [], []
    for l, feats in enumerate(outputs):
        gh, gw, A, D = feats.shape
        anc = ANCHORS[MASKS[l]]
        gx, gy = np.meshgrid(np.arange(gw), np.arange(gh))
        grid = np.stack([gx, gy], -1)[:, :, None, :]
        xy = (_sig(feats[..., :2]) + grid) / np.array([gw, gh])
        wh = np.exp(feats[..., 2:4]) * anc / np.array([W, H])
        obj = _sig(feats[..., 4:5])
        probs = _sig(feats[..., 5:])
        # letterbox inverse (reference yolo_correct_boxes)
        yx = xy[..., ::-1]
        hw_ = wh[..., ::-1]
        inp = np.array([H, W], np.float64)
        img = np.array([ih, iw], np.float64)
        ratio = img / img.max()
        boxed = inp * ratio
        off = (inp - boxed) / 2.0
        scale = img / boxed
        yx = (yx * inp - off) * scale
        hw_ = hw_ * inp * scale
        mins = yx - hw_ / 2
        maxs = yx + hw_ / 2
        boxes = np.concatenate(
            [np.clip(mins[..., 0:1], 0, ih), np.clip(mins[..., 1:2], 0, iw),
             np.clip(maxs[..., 0:1], 0, ih), np.clip(maxs[..., 1:2], 0, iw)], -1,
        )
        all_boxes.append(boxes.reshape(-1, 4))
        all_scores.append((obj * probs).reshape(-1, probs.shape[-1]))
    return np.concatenate(all_boxes), np.concatenate(all_scores)


def np_iou(a, b):
    ymin = np.maximum(a[0], b[:, 0]); xmin = np.maximum(a[1], b[:, 1])
    ymax = np.minimum(a[2], b[:, 2]); xmax = np.minimum(a[3], b[:, 3])
    inter = np.maximum(0, ymax - ymin) * np.maximum(0, xmax - xmin)
    area = lambda v: np.maximum(0, v[..., 2] - v[..., 0]) * np.maximum(0, v[..., 3] - v[..., 1])
    union = area(a) + area(b) - inter
    return np.where(union > 0, inter / np.where(union > 0, union, 1), 0)


def np_nms(boxes, scores, score_thresh, iou_thresh, max_det):
    """Per-class greedy NMS (tf.image.non_max_suppression semantics)."""
    out = []
    for c in range(scores.shape[1]):
        s = scores[:, c].copy()
        s[s < score_thresh] = -np.inf
        picked = []
        while len(picked) < max_det and np.isfinite(s).any() and s.max() > -np.inf:
            i = int(np.argmax(s))
            picked.append((c, float(s[i]), boxes[i].copy()))
            ious = np_iou(boxes[i], boxes)
            s[ious > iou_thresh] = -np.inf
            s[i] = -np.inf
        out.extend(picked)
    return out


def test_detect_matches_numpy_oracle(rng):
    H = W = 96
    outputs = [
        (rng.randn(H // s, W // s, 3, 5 + 4) * 1.5).astype(np.float32)
        for s in (32, 16, 8)
    ]
    image_hw = (150.0, 200.0)
    res = detect(
        [jnp.asarray(o) for o in outputs], jnp.asarray(ANCHORS), 4,
        jnp.asarray(image_hw, jnp.float32),
        score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10,
        num_candidates=1008,  # cover ALL candidates: exactness vs oracle
    )
    got = [
        (int(c), float(s), np.asarray(b))
        for b, s, c, v in zip(
            np.asarray(res.boxes), np.asarray(res.scores),
            np.asarray(res.classes), np.asarray(res.valid),
        )
        if v
    ]
    boxes_np, scores_np = np_decode_all(outputs, (H, W), image_hw)
    want = np_nms(boxes_np, scores_np, 0.3, 0.5, 10)

    assert len(got) == len(want), (len(got), len(want))
    got.sort(key=lambda t: (t[0], -t[1]))
    want.sort(key=lambda t: (t[0], -t[1]))
    for (gc, gs, gb), (wc, ws, wb) in zip(got, want):
        assert gc == wc
        assert gs == pytest.approx(ws, rel=1e-4)
        np.testing.assert_allclose(gb, wb, atol=1e-2)


def test_shared_pool_full_coverage_matches_oracle(rng):
    """pool='shared' with M covering every position and exact top-k is
    bit-for-bit the reference per-class NMS: the shared pool is then just
    a permutation of all candidates and suppression is exact."""
    from yoloret_tpu.ops import detect_batch

    H = W = 96
    B, C = 2, 4
    outputs = [
        (rng.randn(B, H // s, W // s, 3, 5 + C) * 1.5).astype(np.float32)
        for s in (32, 16, 8)
    ]
    hw = np.asarray([[150.0, 200.0], [96.0, 96.0]], np.float32)
    res = detect_batch(
        [jnp.asarray(o) for o in outputs], jnp.asarray(ANCHORS), C,
        jnp.asarray(hw),
        score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10,
        num_candidates=10**9, pool="shared", approx_topk=False,
    )
    for b in range(B):
        got = [
            (int(c), float(s), np.asarray(bx))
            for bx, s, c, v in zip(
                np.asarray(res.boxes[b]), np.asarray(res.scores[b]),
                np.asarray(res.classes[b]), np.asarray(res.valid[b]),
            )
            if v
        ]
        boxes_np, scores_np = np_decode_all(
            [o[b] for o in outputs], (H, W), tuple(hw[b])
        )
        want = np_nms(boxes_np, scores_np, 0.3, 0.5, 10)
        assert len(got) == len(want), (b, len(got), len(want))
        got.sort(key=lambda t: (t[0], -t[1]))
        want.sort(key=lambda t: (t[0], -t[1]))
        for (gc, gs, gb), (wc, ws, wb) in zip(got, want):
            assert gc == wc
            assert gs == pytest.approx(ws, rel=1e-4)
            np.testing.assert_allclose(gb, wb, atol=1e-2)


def test_shared_pool_deep_m_matches_per_class(rng):
    """At a deep-but-partial pool the shared structure agrees with the
    per-class exact path on every surviving detection."""
    from yoloret_tpu.ops import detect_batch

    H = W = 96
    B, C = 2, 4
    outputs = [
        jnp.asarray((rng.randn(B, H // s, W // s, 3, 5 + C) * 1.5).astype(np.float32))
        for s in (32, 16, 8)
    ]
    hw = jnp.asarray([[150.0, 200.0], [96.0, 96.0]], jnp.float32)
    kw = dict(score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10)
    res_s = detect_batch(
        outputs, jnp.asarray(ANCHORS), C, hw,
        num_candidates=512, pool="shared", approx_topk=False, **kw,
    )
    res_p = detect_batch(
        outputs, jnp.asarray(ANCHORS), C, hw,
        num_candidates=1008, pool="per_class", approx_topk=False,
        use_pallas=False, **kw,
    )
    for b in range(B):
        vs, vp = np.asarray(res_s.valid[b]), np.asarray(res_p.valid[b])
        ss = np.sort(np.asarray(res_s.scores[b])[vs])
        sp = np.sort(np.asarray(res_p.scores[b])[vp])
        assert len(ss) == len(sp)
        np.testing.assert_allclose(ss, sp, rtol=1e-5)


def test_detect_batch_matches_per_image_detect(rng):
    """The candidate-first batched path (default) must agree with the
    per-image reference path detection-for-detection."""
    import jax

    from yoloret_tpu.ops import detect_batch

    H = W = 96
    B, C = 3, 4
    outputs = [
        jnp.asarray((rng.randn(B, H // s, W // s, 3, 5 + C) * 1.5).astype(np.float32))
        for s in (32, 16, 8)
    ]
    hw = jnp.asarray([[150.0, 200.0], [96.0, 96.0], [300.0, 40.0]], jnp.float32)
    res_b = detect_batch(
        outputs, jnp.asarray(ANCHORS), C, hw,
        score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10,
        num_candidates=128, use_pallas=False,
    )
    fn = lambda outs, h: detect(
        outs, jnp.asarray(ANCHORS), C, h,
        score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10,
        num_candidates=128,
    )
    res_i = jax.vmap(fn)(tuple(outputs), hw)
    for b in range(B):
        vb = np.asarray(res_b.valid[b])
        vi = np.asarray(res_i.valid[b])
        sb = np.sort(np.asarray(res_b.scores[b])[vb])
        si = np.sort(np.asarray(res_i.scores[b])[vi])
        assert len(sb) == len(si)
        np.testing.assert_allclose(sb, si, rtol=1e-5)
        bb = np.asarray(res_b.boxes[b])[vb]
        bi = np.asarray(res_i.boxes[b])[vi]
        np.testing.assert_allclose(
            sorted(map(tuple, bb.round(3))), sorted(map(tuple, bi.round(3))), atol=1e-2
        )


def test_split_stages_match_fused_detect_batch(rng):
    """shared_pool_candidates + shared_pool_suppress, jitted as two
    SEPARATE programs (the compile-cliff escape for MAP-grade eval,
    tools/compile_split.py), are bitwise the fused detect_batch."""
    import jax

    from yoloret_tpu.ops import (
        detect_batch, shared_pool_candidates, shared_pool_suppress,
    )

    H = W = 96
    B, C = 3, 4
    outputs = [
        jnp.asarray((rng.randn(B, H // s, W // s, 3, 5 + C) * 1.5).astype(np.float32))
        for s in (32, 16, 8)
    ]
    hw = jnp.asarray([[150.0, 200.0], [96.0, 96.0], [300.0, 40.0]], jnp.float32)
    kw = dict(score_threshold=0.3, iou_threshold=0.5, max_det_per_class=10)
    fused = jax.jit(
        lambda outs, h: detect_batch(
            outs, jnp.asarray(ANCHORS), C, h, num_candidates=64, **kw)
    )(tuple(outputs), hw)
    stage_a = jax.jit(
        lambda outs, h: shared_pool_candidates(
            outs, jnp.asarray(ANCHORS), C, h, num_candidates=64)
    )
    stage_b = jax.jit(lambda b_, s_: shared_pool_suppress(b_, s_, **kw))
    split = stage_b(*stage_a(tuple(outputs), hw))
    for name in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fused, name)), np.asarray(getattr(split, name)),
            err_msg=name,
        )


def test_bf16_heads_candidates_bitwise_vs_precast(rng):
    """Round-5 byte diet: shared_pool_candidates keeps the HEAD dtype in
    its [B, N, 5+C] concat and casts f32 only after the top-M gather.
    For bf16 heads that must be BITWISE what force-casting the heads to
    f32 up front (the round-<=4 layout) produced: f32(bf16) is exact and
    max is monotone under the cast, so every value and every ranking is
    unchanged while the dominant materialization moves half the bytes."""
    import jax

    from yoloret_tpu.ops import shared_pool_candidates

    H = W = 96
    B, C = 3, 4
    outputs_bf16 = [
        jnp.asarray((rng.randn(B, H // s, W // s, 3, 5 + C) * 1.5)
                    .astype(np.float32)).astype(jnp.bfloat16)
        for s in (32, 16, 8)
    ]
    outputs_f32 = [o.astype(jnp.float32) for o in outputs_bf16]
    hw = jnp.asarray([[150.0, 200.0], [96.0, 96.0], [300.0, 40.0]], jnp.float32)
    fn = jax.jit(
        lambda outs, h: shared_pool_candidates(
            outs, jnp.asarray(ANCHORS), C, h, num_candidates=64,
            approx_topk=False)
    )
    boxes_b, scores_b = fn(tuple(outputs_bf16), hw)
    boxes_f, scores_f = fn(tuple(outputs_f32), hw)
    assert boxes_b.dtype == jnp.float32 and scores_b.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(boxes_b), np.asarray(boxes_f))
    np.testing.assert_array_equal(np.asarray(scores_b), np.asarray(scores_f))
