"""Data pipeline tests: annotation parsing, device augmentation geometry,
HSV round-trips, and the end-to-end host->device batch iterator."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.data import (
    AugmentConfig,
    Dataset,
    DatasetMode,
    augment_batch,
    eval_batch,
    hsv_to_rgb,
    parse_annotation_line,
    rgb_to_hsv,
)
from yoloret_tpu.data.annotations import dataset_size_from_name, rewrite_image_paths

ANCHORS = np.array(
    [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
     [116, 90], [156, 198], [373, 326]],
    np.float32,
)


def test_parse_annotation_line():
    # classic comma format
    path, boxes = parse_annotation_line(
        "/data/img001.jpg 10,20,30,40,1 50,60,70,80,2\n"
    )
    assert path == "/data/img001.jpg"
    np.testing.assert_array_equal(
        boxes, [[10, 20, 30, 40, 1], [50, 60, 70, 80, 2]]
    )
    # the reference's flat space-separated format (voc_train_14910.txt)
    path, boxes = parse_annotation_line(
        "VOCdevkit/VOC2007/JPEGImages/000017.jpg 185 62 279 199 14 90 78 403 336 12"
    )
    assert path.endswith("000017.jpg")
    np.testing.assert_array_equal(
        boxes, [[185, 62, 279, 199, 14], [90, 78, 403, 336, 12]]
    )
    path, boxes = parse_annotation_line("/plain.jpg")
    assert path == "/plain.jpg" and boxes.shape == (0, 5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        parse_annotation_line("/x.jpg 1 2 3")


def test_dataset_size_from_name():
    assert dataset_size_from_name("voc_train_14910.txt") == 14910
    assert dataset_size_from_name("nosize.txt") is None


def test_rewrite_image_paths():
    out = rewrite_image_paths(["/old/a.jpg 1,2,3,4,0"], "/old", "/new")
    assert out == ["/new/a.jpg 1,2,3,4,0"]


def test_hsv_round_trip(rng):
    rgb = jnp.asarray(rng.rand(16, 16, 3).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_augment_identity_geometry(rng):
    """jitter=0, scale pinned to 1, square input -> exact identity warp."""
    cfg = AugmentConfig(
        input_hw=(64, 64), min_scale=1.0, max_scale=1.0, jitter=0.0,
        flip=False, hue=0.0, sat=0.0, min_gamma=1.0, max_gamma=1.0,
        contrast=0.0,
    )
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    boxes = np.zeros((1, 20, 5), np.float32)
    boxes[0, 0] = [0.125, 0.25, 0.5, 0.75, 3]  # normalized coords
    valid = np.zeros((1, 20), bool)
    valid[0, 0] = True
    out, b, v = augment_batch(jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid), jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out[0]), img[0], atol=1e-5)
    # boxes scaled to pixels: x * 64
    np.testing.assert_allclose(np.asarray(b[0, 0]), [8, 16, 32, 48, 3], atol=1e-4)
    assert bool(v[0, 0])


def test_eval_batch_letterbox_geometry(rng):
    cfg = AugmentConfig(input_hw=(64, 64))
    img = rng.rand(1, 64, 64, 3).astype(np.float32)
    boxes = np.zeros((1, 20, 5), np.float32)
    boxes[0, 0] = [0.0, 0.0, 1.0, 1.0, 0]
    valid = np.zeros((1, 20), bool)
    valid[0, 0] = True
    # a 100x200 (h, w) source letterboxes to 32 rows centered vertically
    hw = np.asarray([[100.0, 200.0]], np.float32)
    out, b, v = eval_batch(jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid), jnp.asarray(hw), cfg)
    x1, y1, x2, y2, _ = np.asarray(b[0, 0])
    assert x1 == pytest.approx(0, abs=1e-4)
    assert x2 == pytest.approx(63, abs=1e-4)  # clipped to w-1
    assert y1 == pytest.approx(16, abs=1e-4)  # (64-32)/2
    assert y2 == pytest.approx(48, abs=1e-4)


def test_augment_boxes_stay_in_bounds(rng):
    cfg = AugmentConfig(input_hw=(64, 64))
    img = rng.rand(4, 64, 64, 3).astype(np.float32)
    boxes = rng.rand(4, 20, 5).astype(np.float32)
    lo = np.minimum(boxes[..., 0:2], boxes[..., 2:4])
    hi = np.maximum(boxes[..., 0:2], boxes[..., 2:4])
    boxes[..., 0:2], boxes[..., 2:4] = lo, hi + 0.1
    boxes[..., 4] = 0
    valid = np.ones((4, 20), bool)
    for seed in range(3):
        out, b, v = augment_batch(
            jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid),
            jax.random.PRNGKey(seed), cfg,
        )
        b = np.asarray(b)
        assert np.all(b[..., :4] >= 0) and np.all(b[..., :4] <= 63)
        assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
        bv = b[np.asarray(v)]
        assert np.all(bv[:, 2] - bv[:, 0] > 1)


@pytest.fixture
def tiny_dataset(tmp_path, rng):
    from PIL import Image

    lines = []
    for i in range(4):
        arr = (rng.rand(80, 120, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 10,10,60,50,{i % 3} 30,20,110,70,1")
    ann = tmp_path / "train_4.txt"
    ann.write_text("\n".join(lines) + "\n")
    return str(ann)


def test_pipeline_train_batches(tiny_dataset):
    ds = Dataset(
        tiny_dataset, batch_size=2, anchors=ANCHORS, num_classes=3,
        input_hw=(64, 64), num_workers=2, seed=1,
    )
    assert len(ds) == 4 and ds.size == 4
    it = ds.build(epochs=1)
    batches = list(it)
    assert len(batches) == 2
    b = batches[0]
    assert b["images"].shape == (2, 64, 64, 3)
    assert b["y_true_0"].shape == (2, 2, 2, 3, 8)
    assert b["y_true_2"].shape == (2, 8, 8, 3, 8)
    assert b["gt_boxes"].shape == (2, 20, 4)
    # at least one positive target cell across the batch
    total_pos = sum(float(jnp.sum(b[f"y_true_{l}"][..., 4])) for l in range(3))
    assert total_pos > 0


def test_pipeline_online_autoaugment(tiny_dataset):
    """aa_policy applies AutoAugment per sample on host: batches keep
    their static shapes, box geometry stays sane, and a fixed seed is
    deterministic across fresh builds."""
    def build():
        return Dataset(
            tiny_dataset, batch_size=2, anchors=ANCHORS, num_classes=3,
            input_hw=(64, 64), num_workers=2, seed=1, aa_policy="v0",
        )

    batches = list(build().build(epochs=2))
    assert len(batches) == 4
    for b in batches:
        assert b["images"].shape == (2, 64, 64, 3)
        gb = np.asarray(b["gt_boxes"])
        gv = np.asarray(b["gt_valid"])
        if gv.any():
            valid_boxes = gb[gv]
            assert np.all(valid_boxes >= -1e-5) and np.all(valid_boxes <= 1 + 1e-5)
    again = list(build().build(epochs=2))
    for a, b in zip(batches, again):
        np.testing.assert_array_equal(np.asarray(a["images"]), np.asarray(b["images"]))
        np.testing.assert_array_equal(np.asarray(a["gt_boxes"]), np.asarray(b["gt_boxes"]))
    # eval mode ignores the policy (no augmentation at eval)
    ds_eval = Dataset(
        tiny_dataset, batch_size=2, anchors=ANCHORS, num_classes=3,
        input_hw=(64, 64), num_workers=2, seed=1, aa_policy="v0",
        mode=DatasetMode.TEST,
    )
    evb = next(iter(ds_eval.build(epochs=1)))
    assert "image_hw" in evb


def test_pipeline_tfrecord_source(tmp_path, rng):
    """Dataset reads TFRecord shards with the reference's Example schema."""
    import io
    from PIL import Image
    from yoloret_tpu.data.tfrecord import Example, TFRecordWriter

    p = str(tmp_path / "train_0.tfrecord")
    with TFRecordWriter(p) as w:
        for i in range(4):
            arr = (rng.rand(60, 90, 3) * 255).astype(np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            ex = Example({
                "image/encoded": buf.getvalue(),
                "image/object/bbox/xmin": [0.1],
                "image/object/bbox/ymin": [0.2],
                "image/object/bbox/xmax": [0.5],
                "image/object/bbox/ymax": [0.8],
                "image/object/bbox/label": [i % 3],
            })
            w.write(ex.serialize())
    ds = Dataset(
        p, batch_size=2, anchors=ANCHORS, num_classes=3,
        input_hw=(64, 64), mode=DatasetMode.TEST, num_workers=2,
    )
    assert len(ds) == 4
    b = next(ds.build(epochs=1))
    assert b["images"].shape == (2, 64, 64, 3)
    np.testing.assert_array_equal(np.asarray(b["image_hw"][0]), [60, 90])
    # normalized 0.1..0.5 x-range -> original pixels 9..45
    ob = np.asarray(b["orig_boxes"][0, 0])
    np.testing.assert_allclose(ob[:4], [9, 12, 45, 48], atol=1e-4)


def test_pipeline_eval_batches(tiny_dataset):
    ds = Dataset(
        tiny_dataset, batch_size=2, anchors=ANCHORS, num_classes=3,
        input_hw=(64, 64), mode=DatasetMode.TEST, num_workers=2,
    )
    b = next(ds.build(epochs=1))
    assert b["image_hw"].shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(b["image_hw"][0]), [80, 120])
    # eval path is deterministic: same batch twice
    b2 = next(ds.build(epochs=1))
    np.testing.assert_allclose(np.asarray(b["images"]), np.asarray(b2["images"]))


def test_train_dataset_smaller_than_batch_raises(tiny_dataset):
    with pytest.raises(ValueError, match="smaller|global batch|reduce"):
        Dataset(tiny_dataset, batch_size=64, anchors=ANCHORS, num_classes=3,
                input_hw=(64, 64))


def test_brightness_augment_applies(rng):
    cfg = AugmentConfig(
        input_hw=(32, 32), min_scale=1.0, max_scale=1.0, jitter=0.0,
        flip=False, hue=0.0, sat=0.0, min_gamma=1.0, max_gamma=1.0,
        contrast=0.0, val=0.4,
    )
    img = np.full((1, 32, 32, 3), 0.5, np.float32)
    boxes = np.zeros((1, 20, 5), np.float32)
    valid = np.zeros((1, 20), bool)
    shifted = False
    for seed in range(4):
        out, _, _ = augment_batch(jnp.asarray(img), jnp.asarray(boxes),
                                  jnp.asarray(valid), jax.random.PRNGKey(seed), cfg)
        if abs(float(out.mean()) - 0.5) > 0.02:
            shifted = True
    assert shifted, "val (brightness) augmentation had no effect"


def test_build_skip_batches_resumes_stream_bitwise(tiny_dataset):
    """build(skip_batches=k) must yield bitwise the batches a fresh
    stream produces at positions k, k+1, ... — host shuffles/quality/AA
    draws are replayed and the device augment key is split forward, so a
    resumed run continues the data order instead of replaying epoch 0."""
    def make():
        return Dataset(
            tiny_dataset, batch_size=2, anchors=ANCHORS, num_classes=3,
            input_hw=(64, 64), num_workers=2, seed=3,
        )

    full = list(make().build(epochs=3))  # 6 batches over 3 shuffled epochs
    skipped = list(make().build(epochs=3, skip_batches=3))
    assert len(full) == 6 and len(skipped) == 3
    for a, b in zip(full[3:], skipped):
        for k in ("images", "gt_boxes", "gt_valid", "y_true_0", "y_true_2"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # and the skipped stream actually differs from an epoch-0 replay
    assert not np.array_equal(
        np.asarray(full[0]["images"]), np.asarray(skipped[0]["images"])
    )
