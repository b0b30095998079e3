"""AutoAugment-for-detection tests.

The core property: every geometric op must move the IMAGE CONTENT and
the BOXES by the same transform. Oracle: paint a colored rectangle on a
gray field, transform, recover the rectangle's bounding box from the
pixels, and compare with the transformed gt box.
"""

import numpy as np
import pytest

from yoloret_tpu.tools.autoaugment import (
    POLICIES,
    _cutout,
    _equalize,
    _rotate,
    _shear,
    _solarize,
    _translate,
    _translate_only_bboxes,
    distort_image_with_autoaugment,
)


def _scene(h=120, w=160, box=(40, 30, 90, 70)):
    img = np.full((h, w, 3), 200, np.uint8)
    x1, y1, x2, y2 = box
    img[y1:y2, x1:x2] = [255, 0, 0]
    boxes = np.array([[x1, y1, x2, y2, 0]], np.float64)
    return img, boxes


def _red_bbox(img):
    mask = (img[..., 0] > 200) & (img[..., 1] < 80) & (img[..., 2] < 80)
    ys, xs = np.where(mask)
    return xs.min(), ys.min(), xs.max() + 1, ys.max() + 1


@pytest.mark.parametrize("op,kw", [
    (_translate, dict(dx=17.0)),
    (_translate, dict(dy=-12.0)),
    (_shear, dict(sx=0.15)),
    (_shear, dict(sy=-0.2)),
    (_rotate, dict(degrees=14.0)),
    (_rotate, dict(degrees=-23.0)),
])
def test_geometric_ops_keep_image_and_boxes_aligned(op, kw):
    img, boxes = _scene()
    out_img, out_boxes = op(img, boxes, **kw)
    assert len(out_boxes) == 1
    px1, py1, px2, py2 = _red_bbox(out_img)
    bx1, by1, bx2, by2 = out_boxes[0, :4]
    # bilinear edges + corner-hull slack: within 2.5 px on every side
    assert abs(px1 - bx1) <= 2.5 and abs(py1 - by1) <= 2.5
    assert abs(px2 - bx2) <= 2.5 and abs(py2 - by2) <= 2.5


def test_translate_clips_and_drops_offscreen():
    img, boxes = _scene()
    _, out = _translate(img, boxes, dx=1000.0)
    assert len(out) == 0  # fully off-image box dropped
    _, out2 = _translate(img, boxes, dx=-35.0)
    assert len(out2) == 1 and out2[0, 0] == pytest.approx(5.0, abs=1e-6)


def test_pixel_ops_leave_boxes_alone():
    img, boxes = _scene()
    assert _equalize(img).shape == img.shape
    sol = _solarize(img, 128)
    assert sol.dtype == np.uint8
    rng = np.random.RandomState(0)
    cut = _cutout(img, 20, rng)
    assert (cut == 128).any()


def test_translate_only_bboxes_moves_content_not_box():
    img, boxes = _scene()
    rng = np.random.RandomState(0)
    out = _translate_only_bboxes(img, boxes, dy_px=15.0, prob=1.0, rng=rng)
    # content inside the box shifted down: top rows of the region now gray
    x1, y1 = 40, 30
    assert (out[y1 + 2, x1 + 5] == 128).all()
    assert (out[y1 + 20, x1 + 5] == [255, 0, 0]).all()
    # outside the box untouched
    assert (out[10, 10] == 200).all()


@pytest.mark.parametrize("policy,n_sub", [
    ("v0", 5), ("v1", 20), ("v2", 15), ("v3", 15),
])
def test_policies_run_and_return_valid_boxes(policy, n_sub):
    """Every policy (reference autoaugment_v1.py:36-144) executes over
    enough draws to touch every sub-policy, producing valid outputs."""
    assert len(POLICIES[policy]) == n_sub
    rng = np.random.RandomState(1)
    for _ in range(3 * n_sub):
        img, boxes = _scene()
        out_img, out_boxes = distort_image_with_autoaugment(
            img, boxes, policy=policy, rng=rng
        )
        assert out_img.dtype == np.uint8 and out_img.shape == img.shape
        if len(out_boxes):
            assert (out_boxes[:, 2] > out_boxes[:, 0]).all()
            assert (out_boxes[:, 3] > out_boxes[:, 1]).all()
            assert out_boxes[:, 0].min() >= 0 and out_boxes[:, 2].max() <= 160


def test_new_pixel_ops():
    from yoloret_tpu.tools.autoaugment import (
        _autocontrast,
        _posterize,
        _solarize_add,
    )

    img, _ = _scene()
    ac = _autocontrast(img)
    assert ac.shape == img.shape and ac.dtype == np.uint8
    post = _posterize(img, 2)
    # 2 bits kept: at most 4 distinct values per channel
    assert len(np.unique(post)) <= 4 * 3
    sa = _solarize_add(img, 50, threshold=210)
    # dark background (200 < 210) shifted up by 50; bright red channel kept
    assert sa[0, 0, 0] == 250 and sa[45, 50, 0] == 255


def test_only_bbox_ops_keep_outside_pixels():
    from yoloret_tpu.tools.autoaugment import _apply_only_bboxes, _bbox_cutout

    img, boxes = _scene()
    rng = np.random.RandomState(0)
    out = _apply_only_bboxes(img, boxes, 1.0, rng, lambda r, _rng: r[:, ::-1])
    assert (out[10, 10] == 200).all()  # outside untouched
    # reference semantics: ONE random box sizes the mask, the center is
    # sampled anywhere in the IMAGE (autoaugment_v1.py _cutout_inside_bbox)
    cut = _bbox_cutout(img, boxes, 1.0, np.random.RandomState(0))
    changed = np.argwhere((cut != img).any(-1))
    assert changed.size  # a cut landed somewhere
    assert (cut[tuple(changed[0])] == 128).all()  # filled with gray
    # mask extent bounded by the chosen box's dims (half-size = frac*dim/2)
    x1, y1, x2, y2 = (int(v) for v in boxes[0, :4])
    ys, xs = changed[:, 0], changed[:, 1]
    assert ys.max() - ys.min() <= (y2 - y1) and xs.max() - xs.min() <= (x2 - x1)


def test_policy_deterministic_with_seed():
    img, boxes = _scene()
    a_img, a_bx = distort_image_with_autoaugment(
        img, boxes, policy="v0", rng=np.random.RandomState(7))
    b_img, b_bx = distort_image_with_autoaugment(
        img, boxes, policy="v0", rng=np.random.RandomState(7))
    np.testing.assert_array_equal(a_img, b_img)
    np.testing.assert_array_equal(a_bx, b_bx)


def test_offline_augment_autoaugment_integration(tmp_path):
    from PIL import Image

    from yoloret_tpu.tools.offline_augment import augment_dataset

    img, boxes = _scene()
    p = tmp_path / "s.jpg"
    Image.fromarray(img).save(p)
    ann = tmp_path / "ann.txt"
    ann.write_text(f"{p} 40,30,90,70,0\n")
    out_list = str(tmp_path / "out.txt")
    n = augment_dataset(
        str(ann), str(tmp_path / "aug"), out_list,
        n_autoaugment=5, aa_policy="v0", seed=0,
    )
    lines = open(out_list).read().strip().splitlines()
    assert len(lines) == n and n >= 2  # original + emitted aa samples
    assert any("aug_aa_" in l for l in lines[1:])


def test_level_mappings_match_reference_conventions():
    """Pin the reference's level_to_arg wiring (autoaugment_v1.py:1464-1545,
    1678-1682): Solarize threshold = lvl/10*256 (NOT inverted), Cutout and
    Cutout_Only_BBoxes share cutout_const=100, Posterize allows bits=0,
    all Translate ops use translate_bbox_const=120."""
    from yoloret_tpu.tools.autoaugment import _lvl_to_translate, _make_ops, _posterize

    ops = _make_ops()
    img, boxes = _scene()

    # Solarize level 8 -> threshold 204: only pixels >= 204 invert, so the
    # dark-red (255,0,0) rect inverts in R only and the 200-gray stays put
    out, _ = ops["Solarize"](img, boxes, 8.0, np.random.RandomState(0))
    assert (out[10, 10] == 200).all()  # 200 < 204: untouched
    assert out[45, 50, 0] == 0  # 255 >= 204: inverted

    # Posterize bits=0 blacks out (v3's ('Posterize', 0.8, 2) -> bits 0)
    assert (_posterize(img, 0) == 0).all()
    # bit-shift posterize, not PIL: 2 bits keeps top-2 bits exactly
    assert set(np.unique(_posterize(img, 2))) <= {0, 64, 128, 192}

    # translate magnitude: level 10 -> +/-120 px
    vals = {abs(_lvl_to_translate(10.0, np.random.RandomState(i))) for i in range(4)}
    assert vals == {120.0}


def test_only_bbox_prob_scaled_by_third():
    """The runner must scale *_Only_BBoxes probs by 1/3
    (_scale_bbox_only_op_probability, autoaugment_v1.py:486-493)."""
    from yoloret_tpu.tools import autoaugment as aa

    seen = {}
    orig = aa._make_ops

    def spy():
        ops = orig()
        real = ops["TranslateY_Only_BBoxes"]

        def wrapper(im, bx, lvl, rng, prob=1.0):
            seen["prob"] = prob
            return real(im, bx, lvl, rng, prob=prob)

        ops["TranslateY_Only_BBoxes"] = wrapper
        return ops

    img, boxes = _scene()
    policy = [[("TranslateY_Only_BBoxes", 0.6, 2)]]
    aa.POLICIES["_probe"] = policy
    aa._make_ops, _saved = spy, orig
    try:
        distort_image_with_autoaugment(img, boxes, "_probe", np.random.RandomState(0))
    finally:
        aa._make_ops = _saved
        del aa.POLICIES["_probe"]
    assert seen["prob"] == pytest.approx(0.6 / 3.0)
