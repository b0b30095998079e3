"""TensorBoard event-writer test: records parse back as Event protos."""

import glob
import struct

import numpy as np

from yoloret_tpu.data.tfrecord import _read_varint, read_tfrecords
from yoloret_tpu.utils.tensorboard import SummaryWriter


def _parse_event(data):
    """Minimal Event decoder: returns (wall_time, step, [(tag, value)])."""
    pos = 0
    wall = step = None
    scalars = []
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        f, w = tag >> 3, tag & 7
        if f == 1 and w == 1:
            (wall,) = struct.unpack_from("<d", data, pos)
            pos += 8
        elif f == 2 and w == 0:
            step, pos = _read_varint(data, pos)
        elif w == 2:
            ln, pos = _read_varint(data, pos)
            body = data[pos : pos + ln]
            pos += ln
            if f == 5:  # Summary
                p2 = 0
                while p2 < len(body):
                    t2, p2 = _read_varint(body, p2)
                    l2, p2 = _read_varint(body, p2)
                    val = body[p2 : p2 + l2]
                    p2 += l2
                    # Summary.Value: tag=1 (str), simple_value=2 (float)
                    p3, vtag, vval = 0, None, None
                    while p3 < len(val):
                        t3, p3 = _read_varint(val, p3)
                        if t3 >> 3 == 1 and t3 & 7 == 2:
                            l3, p3 = _read_varint(val, p3)
                            vtag = val[p3 : p3 + l3].decode()
                            p3 += l3
                        elif t3 >> 3 == 2 and t3 & 7 == 5:
                            (vval,) = struct.unpack_from("<f", val, p3)
                            p3 += 4
                        else:
                            break
                    scalars.append((vtag, vval))
        elif w == 0:
            _, pos = _read_varint(data, pos)
        elif w == 1:
            pos += 8
        elif w == 5:
            pos += 4
    return wall, step, scalars


def _parse_image_value(data):
    """Extract (tag, png_bytes, h, w, c) from the first Summary.Value.image
    event in a record (Value.image = field 4; Image fields h=1, w=2,
    colorspace=3, encoded_image_string=4)."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        f, w = tag >> 3, tag & 7
        if w == 2:
            ln, pos = _read_varint(data, pos)
            body = data[pos : pos + ln]
            pos += ln
            if f != 5:
                continue
            p2 = 0
            t2, p2 = _read_varint(body, p2)
            l2, p2 = _read_varint(body, p2)
            val = body[p2 : p2 + l2]
            p3, vtag, img = 0, None, None
            while p3 < len(val):
                t3, p3 = _read_varint(val, p3)
                if t3 >> 3 == 1 and t3 & 7 == 2:
                    l3, p3 = _read_varint(val, p3)
                    vtag = val[p3 : p3 + l3].decode()
                    p3 += l3
                elif t3 >> 3 == 4 and t3 & 7 == 2:
                    l3, p3 = _read_varint(val, p3)
                    img = val[p3 : p3 + l3]
                    p3 += l3
                else:
                    break
            if img is None:
                continue
            p4, dims, png = 0, {}, None
            while p4 < len(img):
                t4, p4 = _read_varint(img, p4)
                if t4 & 7 == 0:
                    v, p4 = _read_varint(img, p4)
                    dims[t4 >> 3] = v
                elif t4 & 7 == 2:
                    l4, p4 = _read_varint(img, p4)
                    png = img[p4 : p4 + l4]
                    p4 += l4
            return vtag, png, dims.get(1), dims.get(2), dims.get(3)
        elif w == 0:
            _, pos = _read_varint(data, pos)
        elif w == 1:
            pos += 8
        elif w == 5:
            pos += 4
    return None


def test_image_summary_round_trip(tmp_path):
    import io

    from PIL import Image

    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (16, 24, 3), np.uint8)
    d = str(tmp_path / "tb_img")
    with SummaryWriter(d) as w:
        w.add_image("inputs/0", arr, step=5)
    files = glob.glob(d + "/events.out.tfevents.*")
    records = list(read_tfrecords(files[0]))
    parsed = _parse_image_value(records[1])
    assert parsed is not None
    tag, png, h, wdt, c = parsed
    assert (tag, h, wdt, c) == ("inputs/0", 16, 24, 3)
    decoded = np.asarray(Image.open(io.BytesIO(png)))
    np.testing.assert_array_equal(decoded, arr)


def test_summary_writer_round_trip(tmp_path):
    d = str(tmp_path / "tb")
    with SummaryWriter(d) as w:
        w.add_scalar("loss", 3.25, step=1)
        w.add_scalar("val_loss", 1.5, step=2)
    files = glob.glob(d + "/events.out.tfevents.*")
    assert len(files) == 1
    events = [_parse_event(r) for r in read_tfrecords(files[0])]
    assert len(events) == 3  # banner + 2 scalars
    _, step1, sc1 = events[1]
    assert step1 == 1 and sc1 == [("loss", 3.25)]
    _, step2, sc2 = events[2]
    assert step2 == 2
    assert sc2[0][0] == "val_loss" and abs(sc2[0][1] - 1.5) < 1e-6
