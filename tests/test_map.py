"""mAP evaluator tests against hand-computed oracles."""

import numpy as np
import pytest

from yoloret_tpu.eval import MAPEvaluator, voc_ap


def test_voc_ap_perfect():
    assert voc_ap(np.array([1.0]), np.array([1.0])) == pytest.approx(1.0)


def test_voc_ap_envelope():
    # precision recovers later at same recall -> envelope takes the max
    rec = np.array([0.5, 0.5, 1.0])
    prec = np.array([1.0, 0.5, 0.66])
    ap = voc_ap(rec, prec)
    assert ap == pytest.approx(0.5 * 1.0 + 0.5 * 0.66, abs=1e-6)


def test_evaluator_hand_oracle():
    ev = MAPEvaluator(num_classes=1, iou_threshold=0.5)
    a = [10, 10, 50, 50]
    b = [100, 100, 150, 160]
    # image 0: one GT, three predictions (perfect, duplicate, miss)
    ev.add_image(
        np.array([a, a, [200, 200, 240, 240]], float),
        np.array([0.9, 0.8, 0.7]),
        np.array([0, 0, 0]),
        np.array([a + [0]], float),
    )
    # image 1: one GT, no predictions
    ev.add_image(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0,)), np.array([b + [0]], float))
    aps = ev.compute()
    # rec=[.5,.5,.5], prec=[1,.5,1/3] -> AP = 0.5
    assert aps[0] == pytest.approx(0.5, abs=1e-6)


def test_evaluator_dedup_matches_best_first():
    """Lower-scored duplicate of an already-matched GT is an FP."""
    ev = MAPEvaluator(num_classes=1, iou_threshold=0.5)
    a = [0, 0, 100, 100]
    shifted = [5, 5, 105, 105]  # IoU ~0.82 with a
    ev.add_image(
        np.array([a, shifted], float),
        np.array([0.6, 0.9]),  # shifted scores HIGHER -> matches first
        np.array([0, 0]),
        np.array([a + [0]], float),
    )
    aps = ev.compute()
    # shifted (score .9) takes the GT; exact box (score .6) is a dup FP:
    # rec=[1,1], prec=[1,.5] -> AP = 1.0
    assert aps[0] == pytest.approx(1.0, abs=1e-6)


def test_evaluator_multiclass_mean():
    ev = MAPEvaluator(num_classes=2, iou_threshold=0.5)
    a = [10, 10, 50, 50]
    ev.add_image(
        np.array([a], float), np.array([0.9]), np.array([0]),
        np.array([a + [0], [60, 60, 90, 90, 1]], float),
    )
    aps = ev.compute()
    assert aps[0] == pytest.approx(1.0)
    assert aps[1] == 0.0  # class 1 never predicted
    assert np.mean(list(aps.values())) == pytest.approx(0.5)


def test_evaluator_iou_threshold_strict():
    """Match requires IoU strictly greater than the threshold."""
    ev = MAPEvaluator(num_classes=1, iou_threshold=0.5)
    gt = [0, 0, 99, 99]  # +1 convention: area 100x100
    # box with IoU exactly 100*50/(100*100*2 - 100*50) vs gt... use a box
    # with IoU just below .5: right half shifted
    pred = [50, 0, 149, 99]  # inter 50x100=5000(+1 conv), union ~15000 -> 1/3
    ev.add_image(np.array([pred], float), np.array([0.9]), np.array([0]), np.array([gt + [0]], float))
    aps = ev.compute()
    assert aps[0] == 0.0


def test_compute_range_coco_style():
    ev = MAPEvaluator(num_classes=1)
    a = [10, 10, 110, 110]
    near = [15, 15, 115, 115]  # IoU ~0.82 vs a -> TP at .5-.8, FP above
    ev.add_image(np.array([near], float), np.array([0.9]), np.array([0]),
                 np.array([a + [0]], float))
    m_range = ev.compute_range()
    m_50 = np.mean(list(ev.compute().values()))
    assert m_50 == pytest.approx(1.0)
    assert 0.0 < m_range < m_50  # high-IoU thresholds drop the match


def test_infer_detect_split_path_matches_fused(monkeypatch):
    """Above the compile-cliff threshold _infer_detect switches to the
    two-program split (model+candidates / suppression); forcing the
    threshold to 0 must not change any result bit."""
    import jax.numpy as jnp

    import yoloret_tpu.eval.map as evmap
    import yoloret_tpu.ops.postprocess as pp
    from yoloret_tpu.nn import build_detector

    anchors = jnp.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], jnp.float32)
    model = build_detector("mobilenetv2x75", num_classes=4)
    import jax
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), False)
    images = jnp.asarray(
        np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32))
    hw = jnp.full((2, 2), 96.0, jnp.float32)

    kw = dict(num_classes=4, score_threshold=0.0, nms_iou=0.5,
              num_candidates=64)
    fused = evmap._infer_detect(model, variables, images, hw, anchors, **kw)
    monkeypatch.setattr(pp, "COMPILE_CLIFF_BM", 0)
    split = evmap._infer_detect(model, variables, images, hw, anchors, **kw)
    for name in ("boxes", "scores", "classes", "valid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(fused, name)), np.asarray(getattr(split, name)),
            err_msg=name)
