"""YOLO head decode: raw per-scale feature maps -> box parameters.

Matches the semantics of the reference ``yolo_head``
(reference: code/yolo3/model.py:344-371):

  * ``xy = (sigmoid(t_xy) + grid) / (gw, gh)``   (x first, normalized to the
    letterboxed network-input frame, in [0, 1])
  * ``wh = exp(t_wh) * anchor / (W_in, H_in)``   (anchors are (w, h) pixels)
  * objectness / class probabilities via sigmoid.

Everything is static-shape and jit/vmap/grad safe.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import jax


def make_grid(gh: int, gw: int, dtype=jnp.float32) -> jnp.ndarray:
    """Dense grid of cell coordinates, shape [gh, gw, 1, 2] ordered (x, y)."""
    gy = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
    grid = jnp.stack([gx, gy], axis=-1).astype(dtype)  # [gh, gw, 2] (x, y)
    return grid[:, :, None, :]


def decode_boxes(
    feats: jnp.ndarray,
    anchors: jnp.ndarray,
    input_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode box centers/sizes from raw head output.

    Args:
      feats: [..., gh, gw, A, 5+C] raw logits from one detection scale.
      anchors: [A, 2] anchor (w, h) in network-input pixels.
      input_hw: static (H_in, W_in) of the network input.

    Returns:
      (box_xy, box_wh): each [..., gh, gw, A, 2], normalized to [0, 1] in the
      network-input frame, ordered (x, y) / (w, h).
    """
    gh, gw = feats.shape[-4], feats.shape[-3]
    dtype = feats.dtype
    grid = make_grid(gh, gw, dtype)
    anchors = jnp.asarray(anchors, dtype).reshape(1, 1, -1, 2)
    wh_in = jnp.asarray([input_hw[1], input_hw[0]], dtype)  # (W, H)
    gwh = jnp.asarray([gw, gh], dtype)

    box_xy = (jax.nn.sigmoid(feats[..., :2]) + grid) / gwh
    box_wh = jnp.exp(feats[..., 2:4]) * anchors / wh_in
    return box_xy, box_wh


def decode_scale(
    feats: jnp.ndarray,
    anchors: jnp.ndarray,
    input_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full inference decode for one scale.

    Returns (box_xy, box_wh, objectness, class_probs); the last two already
    sigmoid-activated. Shapes [..., gh, gw, A, {2,2,1,C}].
    """
    box_xy, box_wh = decode_boxes(feats, anchors, input_hw)
    objectness = jax.nn.sigmoid(feats[..., 4:5])
    class_probs = jax.nn.sigmoid(feats[..., 5:])
    return box_xy, box_wh, objectness, class_probs


def xywh_to_corners(box_xy: jnp.ndarray, box_wh: jnp.ndarray) -> jnp.ndarray:
    """(x, y) centers + (w, h) -> [ymin, xmin, ymax, xmax] (last axis size 4).

    Matches the corner construction used by the reference loss
    (reference: code/yolo3/model.py:631-633).
    """
    mins = box_xy - box_wh / 2.0
    maxes = box_xy + box_wh / 2.0
    # reverse (x, y) -> (y, x)
    return jnp.concatenate(
        [mins[..., 1:2], mins[..., 0:1], maxes[..., 1:2], maxes[..., 0:1]], axis=-1
    )


def correct_boxes(
    box_xy: jnp.ndarray,
    box_wh: jnp.ndarray,
    input_hw: Tuple[int, int],
    image_hw: jnp.ndarray,
) -> jnp.ndarray:
    """Map letterboxed network-frame boxes back to original-image pixels.

    Mirrors the reference ``yolo_correct_boxes``
    (reference: code/yolo3/model.py:374-399): undo the centered letterbox
    placement, scale back to image pixels, clip to the image, return
    [ymin, xmin, ymax, xmax].

    Args:
      box_xy / box_wh: normalized (x, y)/(w, h) in the network-input frame.
      input_hw: static (H_in, W_in).
      image_hw: [..., 2] float (H_img, W_img) of the original image.
    """
    dtype = box_xy.dtype
    box_yx = box_xy[..., ::-1]
    box_hw = box_wh[..., ::-1]
    input_shape = jnp.asarray(input_hw, dtype)
    image_shape = jnp.asarray(image_hw, dtype)
    max_side = jnp.maximum(image_shape[..., 0], image_shape[..., 1])[..., None]
    ratio = image_shape / max_side
    boxed_shape = input_shape * ratio
    offset = (input_shape - boxed_shape) / 2.0
    scale = image_shape / boxed_shape

    box_yx = (box_yx * input_shape - offset) * scale
    box_hw = box_hw * input_shape * scale

    box_mins = box_yx - box_hw / 2.0
    box_maxes = box_yx + box_hw / 2.0
    h = image_shape[..., 0:1]
    w = image_shape[..., 1:2]
    return jnp.concatenate(
        [
            jnp.clip(box_mins[..., 0:1], 0.0, h),
            jnp.clip(box_mins[..., 1:2], 0.0, w),
            jnp.clip(box_maxes[..., 0:1], 0.0, h),
            jnp.clip(box_maxes[..., 1:2], 0.0, w),
        ],
        axis=-1,
    )
