"""Tools tests: kmeans anchors, offline augmentation, TFRecord codec,
VOC XML conversion."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from yoloret_tpu.data.tfrecord import (
    Example,
    TFRecordWriter,
    crc32c,
    read_tfrecords,
)
from yoloret_tpu.tools.kmeans import kmeans_anchors, write_anchors
from yoloret_tpu.tools.offline_augment import cutout, mixup, mosaic
from yoloret_tpu.tools.voc import parse_voc_xml, voc_to_lists


def test_crc32c_vector():
    # RFC 3720 test vector
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0


def test_example_round_trip():
    ex = Example({
        "image/encoded": b"\x00jpegdata\xff",
        "image/object/bbox/xmin": [0.25, 0.5],
        "image/object/bbox/label": [3, 700000000000],
    })
    back = Example.parse(ex.serialize())
    assert back.features["image/encoded"] == b"\x00jpegdata\xff"
    np.testing.assert_allclose(back.features["image/object/bbox/xmin"], [0.25, 0.5])
    assert back.features["image/object/bbox/label"] == [3, 700000000000]


def test_tfrecord_container(tmp_path):
    p = str(tmp_path / "x.tfrecord")
    recs = [b"a" * 10, b"b" * 1000, b""]
    with TFRecordWriter(p) as w:
        for r in recs:
            w.write(r)
    assert list(read_tfrecords(p)) == recs
    # corrupting a byte must raise
    data = bytearray(open(p, "rb").read())
    data[20] ^= 0xFF
    p2 = str(tmp_path / "bad.tfrecord")
    open(p2, "wb").write(bytes(data))
    with pytest.raises(IOError):
        list(read_tfrecords(p2))


def test_kmeans_two_obvious_clusters():
    rng = np.random.RandomState(0)
    small = rng.rand(100, 2) * 5 + 20   # ~20-25 px
    large = rng.rand(100, 2) * 20 + 200  # ~200-220 px
    anchors, acc = kmeans_anchors(np.concatenate([small, large]), k=2, seed=1)
    assert anchors[0, 0] < 30 and anchors[1, 0] > 150
    assert acc > 0.8


def test_write_anchors_format(tmp_path):
    p = str(tmp_path / "a.txt")
    write_anchors(p, np.array([[10.4, 13.2], [33, 23]]))
    txt = open(p).read().strip()
    assert txt == "10,13, 33,23"


def test_cutout_drops_covered_boxes(rng):
    img = (rng.rand(100, 100, 3) * 255).astype(np.uint8)
    boxes = np.array([[5, 5, 20, 20, 0], [60, 60, 95, 95, 1]], np.float32)

    class FixedRng:
        def uniform(self, a, b):
            return 0.4  # hole = 40x40

        def randint(self, a, b):
            return 0  # at origin -> covers box 0 fully

    out, kept = cutout(img, boxes, rng=FixedRng(), remove_thresh=0.6)
    assert np.all(out[0:40, 0:40] == 127)
    assert len(kept) == 1 and kept[0, 4] == 1


def test_mixup_shapes(rng):
    a = (rng.rand(80, 100, 3) * 255).astype(np.uint8)
    b = (rng.rand(40, 50, 3) * 255).astype(np.uint8)
    ba = np.array([[10, 10, 50, 50, 0]], np.float32)
    bb = np.array([[5, 5, 25, 20, 1]], np.float32)
    mixed, boxes = mixup(a, ba, b, bb)
    assert mixed.shape == (80, 100, 3)
    assert len(boxes) == 2
    # b's boxes scaled x2 into a's frame
    np.testing.assert_allclose(boxes[1, :4], [10, 10, 50, 40])


def test_mosaic_produces_canvas(rng):
    imgs = [(rng.rand(60, 60, 3) * 255).astype(np.uint8) for _ in range(4)]
    boxes = [np.array([[10, 10, 50, 50, i]], np.float32) for i in range(4)]
    canvas, out = mosaic(imgs, boxes, size=320)
    assert canvas.shape == (320, 320, 3)
    assert len(out) >= 3  # tiny quadrants may drop a degenerate box
    assert np.all(out[:, 0] >= 0) and np.all(out[:, 2] <= 320)


VOC_XML = """<annotation>
  <filename>img1.jpg</filename>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>48</xmin><ymin>240</ymin><xmax>195</xmax><ymax>371</ymax></bndbox>
  </object>
  <object><name>person</name><difficult>1</difficult>
    <bndbox><xmin>8</xmin><ymin>12</ymin><xmax>352</xmax><ymax>498</ymax></bndbox>
  </object>
  <object><name>unknown_thing</name><difficult>0</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>2</xmax><ymax>2</ymax></bndbox>
  </object>
</annotation>"""


def test_parse_voc_xml(tmp_path):
    p = tmp_path / "img1.xml"
    p.write_text(VOC_XML)
    fname, boxes = parse_voc_xml(str(p), ["person", "dog"])
    assert fname == "img1.jpg"
    # difficult person skipped, unknown class skipped
    np.testing.assert_array_equal(boxes, [[48, 240, 195, 371, 1]])
    _, boxes2 = parse_voc_xml(str(p), ["person", "dog"], keep_difficult=True)
    assert len(boxes2) == 2


def test_voc_to_tfrecords_round_trip(tmp_path, rng):
    from PIL import Image

    from yoloret_tpu.tools.voc import voc_to_tfrecords

    # two images + a text list
    lines = []
    for i in range(3):
        arr = (rng.rand(40, 60, 3) * 255).astype(np.uint8)
        p = tmp_path / f"im{i}.jpg"
        Image.fromarray(arr).save(p)
        lines.append(f"{p} 6,8,30,24,{i % 2}")
    ann = tmp_path / "list_3.txt"
    ann.write_text("\n".join(lines) + "\n")
    shards = voc_to_tfrecords(str(ann), str(tmp_path / "out"), shard_size=2)
    assert len(shards) == 2  # 3 examples, shard_size 2

    from yoloret_tpu.data.tfrecord import Example, read_tfrecords

    exs = [Example.parse(r) for s in shards for r in read_tfrecords(s)]
    assert len(exs) == 3
    f = exs[0].features
    assert f["image/encoded"][:2] == b"\xff\xd8"  # JPEG magic
    np.testing.assert_allclose(f["image/object/bbox/xmin"], [6 / 60], atol=1e-6)
    np.testing.assert_allclose(f["image/object/bbox/ymax"], [24 / 40], atol=1e-6)


def test_voc_to_lists(tmp_path):
    ann = tmp_path / "ann"
    img = tmp_path / "img"
    ann.mkdir(), img.mkdir()
    for i in range(10):
        x = VOC_XML.replace("img1.jpg", f"img{i}.jpg")
        (ann / f"img{i}.xml").write_text(x)
    out = voc_to_lists(str(ann), str(img), str(tmp_path / "voc"), ["person", "dog"])
    n = sum(len(open(p).read().strip().splitlines()) for p in out.values())
    assert n == 10
    assert out["train"].endswith("_8.txt")  # size convention in filename


def test_cost_analysis_reports_flops():
    from yoloret_tpu.tools.profile import cost_analysis

    c = cost_analysis("mobilenetv2x75", input_hw=(64, 64), batch=1, num_classes=2)
    assert c["params"] > 1e6
    assert c["flops"] > 1e7  # tens of MFLOPs at 64x64
    assert c["bytes_accessed"] > 0
