"""Vectorized anchor/target assignment — the TPU replacement for the
reference's host-side ``tf.py_function`` numpy scatter
(reference: code/yolo3/utils.py:298-376, invoked per-sample at
code/yolo3/data.py:42-67).

Ground-truth boxes arrive padded to a static ``max_boxes`` (invalid rows are
all-zero), so the whole assignment is jit/vmap-able: best-anchor matching is
one broadcasted wh-IoU, and the scatter is a static `fori_loop` over the 20
padded slots (later boxes overwrite earlier ones in the same cell, matching
the reference's sequential numpy writes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yoloret_tpu.ops.boxes import wh_iou

# Scale order matches the reference: index 0 is the coarsest (stride 32).
GRID_STEPS = (32, 16, 8)
ANCHOR_MASKS = ([6, 7, 8], [3, 4, 5], [0, 1, 2])


def anchor_masks_for(num_scales: int) -> Tuple[Sequence[int], ...]:
    """Anchor-index groups per scale (reference: code/yolo3/model.py:444-445)."""
    return tuple(ANCHOR_MASKS[-num_scales:])


def assign_targets(
    boxes: jnp.ndarray,
    input_hw: Tuple[int, int],
    anchors: jnp.ndarray,
    num_classes: int,
    num_scales: int = 3,
) -> Tuple[jnp.ndarray, ...]:
    """Build dense per-scale training targets for ONE image.

    Args:
      boxes: [T, 5] padded ground truth ``(x1, y1, x2, y2, class)`` in
        network-input pixels; rows with non-positive width are padding.
      input_hw: static (H, W) of the network input (multiples of 32).
      anchors: [9, 2] anchor (w, h) in pixels.
      num_classes: C.
      num_scales: 1..3 detection scales.

    Returns:
      Tuple of ``num_scales`` arrays, each [gh, gw, A, 5+C] where slot 0:4 is
      normalized (cx, cy, w, h), slot 4 objectness, 5: one-hot class — the
      exact layout of the reference ``preprocess_true_boxes``.
    """
    boxes = boxes.astype(jnp.float32)
    h, w = input_hw
    wh_in = jnp.asarray([w, h], jnp.float32)
    masks = anchor_masks_for(num_scales)
    anchors = jnp.asarray(anchors, jnp.float32)

    # Centers use floor division like the reference (`(x1+x2)//2`,
    # code/yolo3/utils.py:321).
    box_xy = jnp.floor((boxes[:, 0:2] + boxes[:, 2:4]) / 2.0) / wh_in
    box_wh = (boxes[:, 2:4] - boxes[:, 0:2]) / wh_in
    valid = boxes[:, 2] - boxes[:, 0] > 0  # [T]
    cls = boxes[:, 4].astype(jnp.int32)

    # Best of the 9 anchors per box by wh-IoU.
    iou = wh_iou(box_wh[:, None, :] * wh_in, anchors[None, :, :])  # [T, 9]
    best_anchor = jnp.argmax(iou, axis=-1)  # [T]

    t = boxes.shape[0]
    outs = []
    for l in range(num_scales):
        gh = round(h / GRID_STEPS[l])
        gw = round(w / GRID_STEPS[l])
        a = len(masks[l])
        grid = jnp.zeros((gh, gw, a, 5 + num_classes), jnp.float32)

        mask_arr = jnp.asarray(masks[l], jnp.int32)
        # Which padded slot goes to this scale, and at which anchor sub-index.
        in_scale = (best_anchor[:, None] == mask_arr[None, :]).any(axis=-1) & valid
        k = jnp.argmax(best_anchor[:, None] == mask_arr[None, :], axis=-1)
        gi = jnp.clip(jnp.floor(box_xy[:, 0] * gw).astype(jnp.int32), 0, gw - 1)
        gj = jnp.clip(jnp.floor(box_xy[:, 1] * gh).astype(jnp.int32), 0, gh - 1)

        feat = jnp.concatenate(
            [
                box_xy,
                box_wh,
                jnp.ones((t, 1), jnp.float32),
                jax.nn.one_hot(cls, num_classes, dtype=jnp.float32),
            ],
            axis=-1,
        )  # [T, 5+C]

        def write(i, g):
            row = jnp.where(in_scale[i], feat[i], g[gj[i], gi[i], k[i]])
            return g.at[gj[i], gi[i], k[i]].set(row)

        grid = jax.lax.fori_loop(0, t, write, grid)
        outs.append(grid)
    return tuple(outs)


from functools import partial


@partial(jax.jit, static_argnums=(1, 3, 4))
def assign_targets_batch(
    boxes: jnp.ndarray,
    input_hw: Tuple[int, int],
    anchors: jnp.ndarray,
    num_classes: int,
    num_scales: int = 3,
) -> Tuple[jnp.ndarray, ...]:
    """Batched :func:`assign_targets` (vmap over the leading axis),
    jit-compiled once per (batch, input, classes) configuration."""
    fn = lambda b: assign_targets(b, input_hw, anchors, num_classes, num_scales)
    return jax.vmap(fn)(boxes)


def true_corner_boxes(boxes: jnp.ndarray, input_hw: Tuple[int, int]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Padded GT as normalized (ymin,xmin,ymax,xmax) + validity, for the
    loss's ignore mask. boxes: [..., T, 5] pixel (x1,y1,x2,y2,cls)."""
    h, w = input_hw
    scale = jnp.asarray([h, w, h, w], jnp.float32)
    corners = jnp.stack(
        [boxes[..., 1], boxes[..., 0], boxes[..., 3], boxes[..., 2]], axis=-1
    ) / scale
    valid = (boxes[..., 2] - boxes[..., 0]) > 0
    return corners.astype(jnp.float32), valid
