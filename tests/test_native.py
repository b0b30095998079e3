"""Native data-loader core tests (skipped when the toolchain/libjpeg is
unavailable — every call site falls back to pure Python)."""

import io

import numpy as np
import pytest

from yoloret_tpu import native
from yoloret_tpu.data.tfrecord import crc32c as py_crc32c

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _jpeg_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def test_crc32c_matches_python(rng):
    assert native.crc32c(b"123456789") == 0xE3069283
    for n in (0, 1, 7, 8, 9, 4096, 65537):
        data = rng.bytes(n)
        assert native.crc32c(data) == py_crc32c(data), n


def test_decode_resize_parity_with_pil(tmp_path, rng):
    from PIL import Image

    arr = (rng.rand(120, 90, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out, (h, w) = native.decode_resize(p, 64)
    assert (h, w) == (120, 90)
    assert out.shape == (64, 64, 3) and out.dtype == np.float32
    ref = np.asarray(
        Image.open(p).convert("RGB").resize((64, 64), Image.BILINEAR), np.float32
    ) / 255.0
    # PIL downscales with a scaled triangle filter, the native path with
    # 2x2 bilinear over a DCT-scaled decode — on random NOISE they differ
    # via aliasing; on natural images mean diff is ~0.008 (verified manually).
    assert float(np.abs(out - ref).mean()) < 0.08


def test_decode_resize_bytes(rng):
    arr = (rng.rand(50, 70, 3) * 255).astype(np.uint8)
    out, (h, w) = native.decode_resize_bytes(_jpeg_bytes(arr), 32)
    assert (h, w) == (50, 70) and out.shape == (32, 32, 3)


def test_decode_corrupt_raises(tmp_path):
    p = str(tmp_path / "bad.jpg")
    open(p, "wb").write(b"definitely not a jpeg")
    with pytest.raises(IOError):
        native.decode_resize(p, 32)


def test_batch_decode_with_failures(tmp_path, rng):
    from PIL import Image

    good = str(tmp_path / "g.jpg")
    Image.fromarray((rng.rand(40, 40, 3) * 255).astype(np.uint8)).save(good)
    bad = str(tmp_path / "b.jpg")
    open(bad, "wb").write(b"nope")
    imgs, hw, fails = native.decode_resize_batch([good, bad, good], 32, threads=2)
    assert fails == 1
    assert imgs.shape == (3, 32, 32, 3)
    assert imgs[0].max() > 0 and imgs[2].max() > 0
    assert imgs[1].max() == 0  # failed slot zeroed
    np.testing.assert_array_equal(hw[1], [1, 1])


def test_grayscale_jpeg_broadcasts(tmp_path, rng):
    from PIL import Image

    gray = (rng.rand(64, 64) * 255).astype(np.uint8)
    p = str(tmp_path / "gray.jpg")
    Image.fromarray(gray, mode="L").save(p)
    out, _ = native.decode_resize(p, 32)
    np.testing.assert_allclose(out[..., 0], out[..., 1])
    np.testing.assert_allclose(out[..., 1], out[..., 2])


def test_decode_resize_q_matches_pil_reencode(tmp_path, rng):
    """The fused quality path == libjpeg re-encode of the SAME staging
    square (PIL uses libjpeg too, so this is bitwise)."""
    from PIL import Image

    arr = (rng.rand(240, 360, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "q.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out, (h, w) = native.decode_resize_q_u8(p, 160, 80)
    assert (h, w) == (240, 360) and out.dtype == np.uint8
    base, _ = native.decode_resize_u8(p, 160)
    buf = io.BytesIO()
    Image.fromarray(base).save(buf, format="JPEG", quality=80)
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(out, ref)
    # bytes variant identical to the file variant
    out2, hw2 = native.decode_resize_q_bytes_u8(open(p, "rb").read(), 160, 80)
    assert hw2 == (240, 360)
    np.testing.assert_array_equal(out, out2)


def test_decode_resize_q_zero_is_passthrough(tmp_path, rng):
    from PIL import Image

    arr = (rng.rand(96, 64, 3) * 255).astype(np.uint8)
    p = str(tmp_path / "q0.jpg")
    Image.fromarray(arr).save(p, quality=95)
    base, _ = native.decode_resize_u8(p, 64)
    out, _ = native.decode_resize_q_u8(p, 64, 0)
    np.testing.assert_array_equal(out, base)


def test_decode_resize_q_corrupt_raises():
    with pytest.raises(IOError):
        native.decode_resize_q_bytes_u8(b"not a jpeg", 32, 80)
