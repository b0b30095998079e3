"""AutoAugment for object detection — numpy/PIL implementation.

Equivalent of the reference's vendored TF AutoAugment-for-detection
(reference: code/yolo3/autoaugment_v1.py, entry point
``distort_image_with_autoaugment`` at :1654-1684; policies from Zoph et
al., "Learning Data Augmentation Strategies for Object Detection").
The reference never wires it into its main path (SURVEY §2.2); here it
is a first-class offline-augmentation option
(``tools/offline_augment.py --autoaugment N``).

Design: every geometric op goes through ONE affine core — the image is
warped with PIL (which maps output->input, so it gets the inverse
matrix) and the boxes' corners are mapped with the FORWARD matrix, so
image and boxes stay consistent by construction (oracle-tested in
tests/test_autoaugment.py by tracking a painted rectangle).

Boxes are [N, 5] float (x1, y1, x2, y2, class) in pixels.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

GRAY = 128  # replace/fill value, matches the TF implementation
_MAX_LEVEL = 10.0


# ---- affine core ---------------------------------------------------------

def _affine(image: np.ndarray, boxes: np.ndarray, m: np.ndarray):
    """Apply forward 2x3 affine ``m`` (maps input (x, y, 1) -> output
    (x', y')) to image and boxes."""
    from PIL import Image

    h, w = image.shape[:2]
    m3 = np.vstack([m, [0.0, 0.0, 1.0]])
    inv = np.linalg.inv(m3)
    pil = Image.fromarray(image)
    out = pil.transform(
        (w, h), Image.AFFINE,
        data=tuple(inv[:2].ravel()),
        resample=Image.BILINEAR,
        fillcolor=(GRAY, GRAY, GRAY),
    )
    if boxes.size == 0:
        return np.asarray(out), boxes.reshape(0, 5)
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]], boxes[:, [0, 3]], boxes[:, [2, 3]]
    ], axis=1)  # [N, 4, 2]
    ones = np.ones((*corners.shape[:2], 1))
    mapped = np.concatenate([corners, ones], -1) @ m.T  # [N, 4, 2]
    new = boxes.copy()
    new[:, 0] = mapped[..., 0].min(1)
    new[:, 1] = mapped[..., 1].min(1)
    new[:, 2] = mapped[..., 0].max(1)
    new[:, 3] = mapped[..., 1].max(1)
    new[:, [0, 2]] = np.clip(new[:, [0, 2]], 0, w)
    new[:, [1, 3]] = np.clip(new[:, [1, 3]], 0, h)
    keep = (new[:, 2] - new[:, 0] >= 1) & (new[:, 3] - new[:, 1] >= 1)
    return np.asarray(out), new[keep]


def _translate(image, boxes, dx=0.0, dy=0.0):
    return _affine(image, boxes, np.array([[1.0, 0.0, dx], [0.0, 1.0, dy]]))


def _shear(image, boxes, sx=0.0, sy=0.0):
    return _affine(image, boxes, np.array([[1.0, sx, 0.0], [sy, 1.0, 0.0]]))


def _rotate(image, boxes, degrees):
    h, w = image.shape[:2]
    cx, cy = w / 2.0, h / 2.0
    t = np.deg2rad(degrees)
    c, s = np.cos(t), np.sin(t)
    # rotate about the image center
    m = np.array([
        [c, -s, cx - c * cx + s * cy],
        [s, c, cy - s * cx - c * cy],
    ])
    return _affine(image, boxes, m)


# ---- color / pixel ops ---------------------------------------------------

def _enhance(image, kind: str, factor: float):
    from PIL import Image, ImageEnhance

    enh = getattr(ImageEnhance, kind)(Image.fromarray(image))
    return np.asarray(enh.enhance(factor))


def _equalize(image):
    from PIL import Image, ImageOps

    return np.asarray(ImageOps.equalize(Image.fromarray(image)))


def _solarize(image, threshold=128):
    return np.where(image < threshold, image, 255 - image).astype(np.uint8)


def _cutout(image, pad: int, rng):
    h, w = image.shape[:2]
    if pad <= 0:
        return image
    cy, cx = rng.randint(0, h), rng.randint(0, w)
    y0, y1 = max(0, cy - pad), min(h, cy + pad)
    x0, x1 = max(0, cx - pad), min(w, cx + pad)
    out = image.copy()
    out[y0:y1, x0:x1] = GRAY
    return out


def _translate_only_bboxes(image, boxes, dy_px: float, prob: float, rng):
    """Shift the pixel CONTENT inside each gt box vertically (boxes stay
    put) — the reference's TranslateY_Only_BBoxes (applied per box with
    ``prob``)."""
    out = image.copy()
    h, _w = image.shape[:2]
    for b in boxes:
        if rng.rand() >= prob:
            continue
        x0, y0, x1, y1 = (int(round(v)) for v in b[:4])
        x0, y0 = max(0, x0), max(0, y0)
        x1, y1 = min(out.shape[1], x1), min(h, y1)
        if x1 <= x0 or y1 <= y0:
            continue
        region = out[y0:y1, x0:x1].copy()
        shifted = np.full_like(region, GRAY)
        d = int(round(dy_px))
        rh = y1 - y0
        if d >= rh or -d >= rh:
            out[y0:y1, x0:x1] = shifted
            continue
        if d >= 0:
            shifted[d:] = region[: rh - d]
        else:
            shifted[: rh + d] = region[-d:]
        out[y0:y1, x0:x1] = shifted
    return out


# ---- level -> argument conversions (TF autoaugment conventions) ---------

def _lvl_to_translate(level, rng, max_px=250.0):
    v = level / _MAX_LEVEL * max_px
    return -v if rng.rand() < 0.5 else v


def _lvl_to_shear(level, rng, max_s=0.3):
    v = level / _MAX_LEVEL * max_s
    return -v if rng.rand() < 0.5 else v


def _lvl_to_rotate(level, rng, max_deg=30.0):
    v = level / _MAX_LEVEL * max_deg
    return -v if rng.rand() < 0.5 else v


def _lvl_to_enhance(level):
    return level / _MAX_LEVEL * 1.8 + 0.1


# ---- op table ------------------------------------------------------------

def _make_ops() -> Dict[str, Callable]:
    return {
        "TranslateX_BBox": lambda im, bx, lvl, rng: _translate(
            im, bx, dx=_lvl_to_translate(lvl, rng)),
        "TranslateY_BBox": lambda im, bx, lvl, rng: _translate(
            im, bx, dy=_lvl_to_translate(lvl, rng)),
        "ShearX_BBox": lambda im, bx, lvl, rng: _shear(
            im, bx, sx=_lvl_to_shear(lvl, rng)),
        "ShearY_BBox": lambda im, bx, lvl, rng: _shear(
            im, bx, sy=_lvl_to_shear(lvl, rng)),
        "Rotate_BBox": lambda im, bx, lvl, rng: _rotate(
            im, bx, _lvl_to_rotate(lvl, rng)),
        "Equalize": lambda im, bx, lvl, rng: (_equalize(im), bx),
        "Solarize": lambda im, bx, lvl, rng: (
            _solarize(im, int(256 - lvl / _MAX_LEVEL * 256)), bx),
        "Color": lambda im, bx, lvl, rng: (
            _enhance(im, "Color", _lvl_to_enhance(lvl)), bx),
        "Sharpness": lambda im, bx, lvl, rng: (
            _enhance(im, "Sharpness", _lvl_to_enhance(lvl)), bx),
        "Contrast": lambda im, bx, lvl, rng: (
            _enhance(im, "Contrast", _lvl_to_enhance(lvl)), bx),
        "Brightness": lambda im, bx, lvl, rng: (
            _enhance(im, "Brightness", _lvl_to_enhance(lvl)), bx),
        "Cutout": lambda im, bx, lvl, rng: (
            _cutout(im, int(lvl / _MAX_LEVEL * 100), rng), bx),
        "TranslateY_Only_BBoxes": lambda im, bx, lvl, rng: (
            _translate_only_bboxes(
                im, bx, _lvl_to_translate(lvl, rng, max_px=120.0), 1.0, rng),
            bx),
    }


# Policy v0 (reference autoaugment_v1.py policy_v0; Zoph et al. Table 8):
# 5 sub-policies of (op, probability, magnitude) pairs.
POLICIES: Dict[str, List[List[Tuple[str, float, int]]]] = {
    "v0": [
        [("TranslateX_BBox", 0.6, 4), ("Equalize", 0.8, 10)],
        [("TranslateY_Only_BBoxes", 0.2, 2), ("Cutout", 0.8, 8)],
        [("Sharpness", 0.0, 8), ("ShearX_BBox", 0.4, 0)],
        [("ShearY_BBox", 1.0, 2), ("TranslateY_Only_BBoxes", 0.6, 6)],
        [("Rotate_BBox", 0.6, 10), ("Color", 1.0, 6)],
    ],
    # deterministic single-op policy for tests/debugging
    "test": [[("TranslateX_BBox", 1.0, 4)]],
}


def distort_image_with_autoaugment(
    image: np.ndarray,
    boxes: np.ndarray,
    policy: str = "v0",
    rng: Optional[np.random.RandomState] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Apply one randomly-chosen sub-policy of ``policy`` to an HWC
    uint8 image + [N, 5] pixel boxes (reference entry point:
    code/yolo3/autoaugment_v1.py:1654-1684)."""
    if rng is None:
        rng = np.random.RandomState()
    if policy not in POLICIES:
        raise ValueError(f"unknown policy {policy!r}; have {sorted(POLICIES)}")
    ops = _make_ops()
    sub = POLICIES[policy][rng.randint(len(POLICIES[policy]))]
    image = np.ascontiguousarray(image)
    boxes = np.asarray(boxes, np.float64).reshape(-1, 5)
    for name, prob, level in sub:
        if rng.rand() >= prob:
            continue
        image, boxes = ops[name](image, boxes, float(level), rng)
    return image.astype(np.uint8), boxes
