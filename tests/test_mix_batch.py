"""Online mosaic/mixup (data/augment.py::mix_batch) — an extension: the
reference ships these only as the offline script (augment_data.py:
122-192). Oracle checks: image composition, box geometry/union, class
preservation, passthrough identity, and pipeline integration."""

import numpy as np
import jax
import jax.numpy as jnp

from yoloret_tpu.data.augment import AugmentConfig, mix_batch

H = W = 64
T = 5


def _batch():
    """4 solid-color images, one centered box each, distinct classes."""
    imgs = np.zeros((4, H, W, 3), np.float32)
    colors = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)]
    boxes = np.zeros((4, T, 5), np.float32)
    valid = np.zeros((4, T), bool)
    for i, c in enumerate(colors):
        imgs[i] = c
        boxes[i, 0] = [10, 14, 40, 50, i]  # x1 y1 x2 y2 cls
        valid[i, 0] = True
    return jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(valid)


def test_passthrough_is_identity():
    """Both probs 0: inputs pass through untouched at capacity T (no
    4x padding for a disabled feature — advisor finding, round 3)."""
    imgs, boxes, valid = _batch()
    cfg = AugmentConfig(input_hw=(H, W), mosaic_prob=0.0, mixup_prob=0.0)
    oi, ob, ov = mix_batch(imgs, boxes, valid, jax.random.PRNGKey(0), cfg)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(imgs))
    assert ob.shape == (4, T, 5) and ov.shape == (4, T)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(valid))


def test_capacity_sized_by_enabled_modes():
    """mixup-only needs a 2-way union: capacity is 2T, not 4T; mosaic
    (with or without mixup) needs 4T."""
    imgs, boxes, valid = _batch()
    key = jax.random.PRNGKey(0)
    cfg = AugmentConfig(input_hw=(H, W), mixup_prob=0.5)
    _, ob, ov = mix_batch(imgs, boxes, valid, key, cfg)
    assert ob.shape == (4, 2 * T, 5) and ov.shape == (4, 2 * T)
    cfg = AugmentConfig(input_hw=(H, W), mosaic_prob=0.5)
    _, ob, ov = mix_batch(imgs, boxes, valid, key, cfg)
    assert ob.shape == (4, 4 * T, 5) and ov.shape == (4, 4 * T)
    cfg = AugmentConfig(input_hw=(H, W), mosaic_prob=0.5, mixup_prob=0.5)
    _, ob, ov = mix_batch(imgs, boxes, valid, key, cfg)
    assert ob.shape == (4, 4 * T, 5) and ov.shape == (4, 4 * T)


def test_mosaic_composes_quadrants_and_boxes():
    imgs, boxes, valid = _batch()
    cfg = AugmentConfig(input_hw=(H, W), mosaic_prob=1.0)
    oi, ob, ov = mix_batch(imgs, boxes, valid, jax.random.PRNGKey(1), cfg)
    oi, ob, ov = np.asarray(oi), np.asarray(ob), np.asarray(ov)
    # Row 0's mosaic: quadrants are (half-scale) rows 0, 1, 2, 3 — solid
    # colors survive any resize.
    h2, w2 = H // 2, W // 2
    assert np.allclose(oi[0, :h2, :w2], [1, 0, 0], atol=1e-6)
    assert np.allclose(oi[0, :h2, w2:], [0, 1, 0], atol=1e-6)
    assert np.allclose(oi[0, h2:, :w2], [0, 0, 1], atol=1e-6)
    assert np.allclose(oi[0, h2:, w2:], [1, 1, 0], atol=1e-6)
    # Exactly 4 valid boxes, one per quadrant, half-scaled + offset,
    # classes preserved.
    assert ov[0].sum() == 4
    got = {tuple(np.round(b, 3)) for b in ob[0][ov[0]]}
    want = set()
    for q, (ox, oy) in enumerate([(0, 0), (w2, 0), (0, h2), (w2, h2)]):
        want.add((10 * 0.5 + ox, 14 * 0.5 + oy, 40 * 0.5 + ox, 50 * 0.5 + oy, float(q)))
    assert got == want
    # Row 2 wraps: quadrants 2,3,0,1.
    assert np.allclose(oi[2, :h2, :w2], [0, 0, 1], atol=1e-6)
    assert np.allclose(oi[2, h2:, w2:], [0, 1, 0], atol=1e-6)


def test_mixup_blends_pixels_and_unions_boxes():
    imgs, boxes, valid = _batch()
    cfg = AugmentConfig(input_hw=(H, W), mixup_prob=1.0)
    oi, ob, ov = mix_batch(imgs, boxes, valid, jax.random.PRNGKey(2), cfg)
    oi, ob, ov = np.asarray(oi), np.asarray(ob), np.asarray(ov)
    # Partner of row 0 is row 2 (roll B/2): out = lam*red + (1-lam)*blue.
    lam = oi[0, 0, 0, 0]  # red channel recovers lam
    assert 0.0 <= lam <= 1.0
    np.testing.assert_allclose(oi[0, :, :, 2], 1.0 - lam, atol=1e-6)
    np.testing.assert_allclose(oi[0, :, :, 1], 0.0, atol=1e-6)
    # Box union at full weight: own box (cls 0) + partner's (cls 2).
    assert ov[0].sum() == 2
    cls = sorted(ob[0][ov[0]][:, 4].tolist())
    assert cls == [0.0, 2.0]
    for b in ob[0][ov[0]]:
        np.testing.assert_allclose(b[:4], [10, 14, 40, 50], atol=1e-6)


def test_mosaic_wins_when_both_fire():
    imgs, boxes, valid = _batch()
    cfg = AugmentConfig(input_hw=(H, W), mosaic_prob=1.0, mixup_prob=1.0)
    oi, _, ov = mix_batch(imgs, boxes, valid, jax.random.PRNGKey(3), cfg)
    assert np.asarray(ov)[0].sum() == 4  # mosaic's 4-box union, not mixup's 2


def test_pipeline_integration(tmp_path):
    """Dataset with mosaic/mixup enabled emits well-formed train batches
    (targets assigned over the 4T box capacity) and the default path is
    untouched (branch gated on the probs)."""
    from PIL import Image

    from yoloret_tpu.data import Dataset, DatasetMode

    lines = []
    for i in range(4):
        arr = np.full((96, 96, 3), 30, np.uint8)
        arr[20:50, 10:50] = [220, 40, 40]
        p = tmp_path / f"m{i}.jpg"
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 10,20,50,50,0")
    ann = tmp_path / "mix_train_4.txt"
    ann.write_text("\n".join(lines) + "\n")
    anchors = np.array(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], np.float32)
    kw = dict(batch_size=4, anchors=anchors, num_classes=1,
              input_hw=(64, 64), mode=DatasetMode.TRAIN, seed=0)
    ds = Dataset(str(ann),
                 augment_config=AugmentConfig(mosaic_prob=0.7, mixup_prob=0.3),
                 **kw)
    batch = next(iter(ds.build(epochs=1)))
    assert batch["gt_boxes"].shape == (4, 80, 4)
    assert batch["gt_valid"].shape == (4, 80)
    assert batch["y_true_0"].shape[0] == 4
    assert np.isfinite(np.asarray(batch["images"])).all()
    # dense targets consistent with the (possibly mixed) gt count
    assert int(np.asarray(batch["gt_valid"]).sum()) >= 4

    base = next(iter(Dataset(str(ann), **kw).build(epochs=1)))
    assert base["gt_boxes"].shape == (4, 20, 4)  # default path unchanged


def test_small_batch_mixing_warns(tmp_path):
    """batch < 4 with mosaic (or < 2 with mixup) wraps partners onto the
    sample itself — Dataset warns at construction (advisor, round 3)."""
    import warnings as _w

    from PIL import Image

    from yoloret_tpu.data import Dataset, DatasetMode

    img = tmp_path / "w.jpg"
    Image.fromarray(np.full((32, 32, 3), 50, np.uint8)).save(img)
    ann = tmp_path / "w_2.txt"
    ann.write_text(f"{img} 2,2,20,20,0\n{img} 2,2,20,20,0\n")
    anchors = np.array([[10, 13]] * 9, np.float32)
    kw = dict(anchors=anchors, num_classes=1, input_hw=(32, 32),
              mode=DatasetMode.TRAIN, seed=0)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        Dataset(str(ann), batch_size=2,
                augment_config=AugmentConfig(mosaic_prob=0.5), **kw)
    assert any("mosaic" in str(r.message) for r in rec)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        Dataset(str(ann), batch_size=1,
                augment_config=AugmentConfig(mixup_prob=0.5), **kw)
    assert any("mixup" in str(r.message) for r in rec)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        Dataset(str(ann), batch_size=2,
                augment_config=AugmentConfig(mixup_prob=0.5), **kw)
    assert not rec  # batch 2 mixup is fine
