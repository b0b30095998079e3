"""Box geometry ops: IoU / GIoU on corner-encoded boxes.

Boxes are encoded ``[ymin, xmin, ymax, xmax]`` along the last axis and the
functions broadcast over any leading shape, matching the semantics of the
reference ``do_giou_calculate`` (reference: code/yolo3/utils.py:9-53) —
degenerate boxes clamp to zero area and all divisions are div-no-nan.

Pure jnp; safe inside jit / grad / vmap.
"""

from __future__ import annotations

import jax.numpy as jnp


def _div_no_nan(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """x/y with 0 where y == 0 (tf.math.divide_no_nan semantics)."""
    return jnp.where(den != 0, num / jnp.where(den != 0, den, 1.0), 0.0)


def pairwise_iou(b1: jnp.ndarray, b2: jnp.ndarray, *, mode: str = "iou") -> jnp.ndarray:
    """Broadcasted IoU/GIoU between boxes ``[..., 4]`` in (ymin,xmin,ymax,xmax).

    Args:
      b1, b2: boxes with broadcast-compatible leading shapes.
      mode: 'iou' or 'giou'.

    Returns:
      Tensor of IoU (or GIoU in [-1, 1]) values with the broadcast shape.
    """
    b1_ymin, b1_xmin, b1_ymax, b1_xmax = jnp.moveaxis(b1, -1, 0)
    b2_ymin, b2_xmin, b2_ymax, b2_xmax = jnp.moveaxis(b2, -1, 0)

    b1_w = jnp.maximum(0.0, b1_xmax - b1_xmin)
    b1_h = jnp.maximum(0.0, b1_ymax - b1_ymin)
    b2_w = jnp.maximum(0.0, b2_xmax - b2_xmin)
    b2_h = jnp.maximum(0.0, b2_ymax - b2_ymin)
    b1_area = b1_w * b1_h
    b2_area = b2_w * b2_h

    inter_ymin = jnp.maximum(b1_ymin, b2_ymin)
    inter_xmin = jnp.maximum(b1_xmin, b2_xmin)
    inter_ymax = jnp.minimum(b1_ymax, b2_ymax)
    inter_xmax = jnp.minimum(b1_xmax, b2_xmax)
    inter_w = jnp.maximum(0.0, inter_xmax - inter_xmin)
    inter_h = jnp.maximum(0.0, inter_ymax - inter_ymin)
    inter_area = inter_w * inter_h

    union_area = b1_area + b2_area - inter_area
    iou = _div_no_nan(inter_area, union_area)
    if mode == "iou":
        return iou

    enc_ymin = jnp.minimum(b1_ymin, b2_ymin)
    enc_xmin = jnp.minimum(b1_xmin, b2_xmin)
    enc_ymax = jnp.maximum(b1_ymax, b2_ymax)
    enc_xmax = jnp.maximum(b1_xmax, b2_xmax)
    enc_w = jnp.maximum(0.0, enc_xmax - enc_xmin)
    enc_h = jnp.maximum(0.0, enc_ymax - enc_ymin)
    enc_area = enc_w * enc_h
    return iou - _div_no_nan(enc_area - union_area, enc_area)


def iou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Broadcasted IoU (see :func:`pairwise_iou`)."""
    return pairwise_iou(b1, b2, mode="iou")


def giou(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Broadcasted generalized IoU (see :func:`pairwise_iou`)."""
    return pairwise_iou(b1, b2, mode="giou")


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU of origin-centered (w, h) rectangles, broadcastable.

    Used for anchor assignment (reference: code/yolo3/utils.py:339-354 builds
    centered corner boxes then calls the IoU kernel; intersecting two
    origin-centered rects reduces to min-w * min-h).
    """
    w1, h1 = wh1[..., 0], wh1[..., 1]
    w2, h2 = wh2[..., 0], wh2[..., 1]
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    union = w1 * h1 + w2 * h2 - inter
    return _div_no_nan(inter, union)
