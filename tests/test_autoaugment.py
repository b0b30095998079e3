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
    cut = _bbox_cutout(img, boxes, 0.5, 1.0, np.random.RandomState(0))
    assert (cut[10, 10] == 200).all()
    x1, y1, x2, y2 = (int(v) for v in boxes[0, :4])
    assert (cut[y1:y2, x1:x2] == 128).any()  # content cut inside the box


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
