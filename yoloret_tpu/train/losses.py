"""YOLO-ReT training loss — TPU-native rewrite of ``YoloLoss``
(reference: code/yolo3/model.py:585-691).

Per detection scale:
  * decode raw xy/wh with the shared head math (ops/decode.py),
  * GIoU box loss on positive cells: ``object_mask * (1 - giou)``
    (reference :665-668); optional MSE branch implementing the
    *intended* behavior of the reference's broken MSE path (:672-690),
  * objectness BCE where negatives are masked out when their best IoU
    against the image's ground-truth boxes exceeds ``ignore_thresh``
    (reference :643-657),
  * class BCE on positives (reference :658-662),
  * every term summed and divided by the batch size (reference :624,662-668).

Static-shape deviation (documented): the reference builds the ignore mask
with a dynamic ``tf.boolean_mask`` over the *whole batch's* positive boxes
(reference :643-651), so predictions are compared against other images'
objects too. Here each image is compared against its own padded
``max_boxes`` ground-truth list (invalid rows masked) — the standard
YOLOv3 semantics — keeping every shape static for XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from yoloret_tpu.ops.boxes import pairwise_iou
from yoloret_tpu.ops.decode import decode_boxes, make_grid, xywh_to_corners
from yoloret_tpu.ops.targets import GRID_STEPS, anchor_masks_for


class LossBreakdown(NamedTuple):
    total: jnp.ndarray
    box: jnp.ndarray
    confidence: jnp.ndarray
    classification: jnp.ndarray


def _bce_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable sigmoid cross-entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_crossentropy(
    labels: jnp.ndarray,
    logits: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """RetinaNet focal loss on logits — the reference defines this helper
    (code/yolo3/model.py:528-583) and keeps the class-loss call commented
    out (:660-661); here it is a working option (``class_loss='focal'``)."""
    ce = _bce_logits(logits, labels)
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    alpha_factor = labels * alpha + (1.0 - labels) * (1.0 - alpha) if alpha else 1.0
    modulating = (1.0 - p_t) ** gamma if gamma else 1.0
    return alpha_factor * modulating * ce


def yolo_loss_per_scale(
    yolo_output: jnp.ndarray,
    y_true: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    grid_step: int,
    ignore_thresh: float = 0.5,
    box_loss: str = "giou",
    class_loss_kind: str = "bce",
) -> LossBreakdown:
    """Loss for ONE detection scale.

    Args:
      yolo_output: [B, gh, gw, A, 5+C] raw logits.
      y_true: [B, gh, gw, A, 5+C] dense targets (ops/targets.py layout).
      gt_boxes: [B, T, 4] normalized (ymin, xmin, ymax, xmax) padded GT.
      gt_valid: [B, T] bool validity of the padded GT rows.
      anchors: [A, 2] anchor (w, h) pixels for THIS scale.
      grid_step: stride of this scale (32 / 16 / 8).
      ignore_thresh: IoU above which unmatched predictions are not
        penalized as background (reference :591).
      box_loss: 'giou' (default) or 'mse'.
    """
    f32 = jnp.float32
    yolo_output = yolo_output.astype(f32)
    y_true = y_true.astype(f32)
    b, gh, gw = yolo_output.shape[0], yolo_output.shape[1], yolo_output.shape[2]
    input_hw = (gh * grid_step, gw * grid_step)
    bf = f32(b)

    object_mask = y_true[..., 4:5]
    true_class_probs = y_true[..., 5:]

    pred_xy, pred_wh = decode_boxes(yolo_output, anchors, input_hw)
    pred_box = xywh_to_corners(pred_xy, pred_wh)  # [B,gh,gw,A,4]

    true_box = xywh_to_corners(y_true[..., 0:2], y_true[..., 2:4])
    true_box = jnp.clip(true_box, 0.0, 1.0)

    # Ignore mask: best IoU of every prediction vs the image's GT list.
    iou = pairwise_iou(
        pred_box[:, :, :, :, None, :], gt_boxes[:, None, None, None, :, :]
    )  # [B,gh,gw,A,T]
    iou = jnp.where(gt_valid[:, None, None, None, :], iou, 0.0)
    best_iou = jnp.max(iou, axis=-1, keepdims=True)
    ignore_mask = (best_iou < ignore_thresh).astype(f32)

    obj_logits = yolo_output[..., 4:5]
    obj_bce = _bce_logits(obj_logits, object_mask)
    confidence_loss = object_mask * obj_bce + (1.0 - object_mask) * obj_bce * ignore_mask
    confidence_loss = jnp.sum(confidence_loss) / bf

    if class_loss_kind == "focal":
        cls_term = sigmoid_focal_crossentropy(true_class_probs, yolo_output[..., 5:])
    else:
        cls_term = _bce_logits(yolo_output[..., 5:], true_class_probs)
    class_loss = object_mask * cls_term
    class_loss = jnp.sum(class_loss) / bf

    if box_loss == "giou":
        g = pairwise_iou(pred_box, true_box, mode="giou")
        box = jnp.sum(object_mask * (1.0 - g[..., None])) / bf
    elif box_loss == "mse":
        # Intended behavior of the reference's (broken) MSE branch
        # (reference :672-690): BCE on xy offsets, squared error on log-wh,
        # scaled by (2 - w*h).
        grid = make_grid(gh, gw, f32)
        gwh = jnp.asarray([gw, gh], f32)
        wh_in = jnp.asarray([input_hw[1], input_hw[0]], f32)
        raw_true_xy = y_true[..., 0:2] * gwh - grid
        safe_wh = jnp.where(object_mask > 0, y_true[..., 2:4], 1.0)
        raw_true_wh = jnp.log(safe_wh * wh_in / jnp.asarray(anchors, f32).reshape(1, 1, 1, -1, 2))
        raw_true_wh = jnp.where(object_mask > 0, raw_true_wh, 0.0)
        scale = 2.0 - y_true[..., 2:3] * y_true[..., 3:4]
        xy_loss = object_mask * scale * _bce_logits(yolo_output[..., 0:2], raw_true_xy)
        wh_loss = object_mask * scale * 0.5 * jnp.square(raw_true_wh - yolo_output[..., 2:4])
        box = (jnp.sum(xy_loss) + jnp.sum(wh_loss)) / bf
    else:
        raise ValueError(f"unknown box_loss {box_loss!r}")

    total = box + confidence_loss + class_loss
    return LossBreakdown(total, box, confidence_loss, class_loss)


def yolo_loss(
    yolo_outputs: Sequence[jnp.ndarray],
    y_trues: Sequence[jnp.ndarray],
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    anchors: jnp.ndarray,
    num_scales: int = 3,
    ignore_thresh: float = 0.5,
    box_loss: str = "giou",
    class_loss_kind: str = "bce",
) -> Tuple[jnp.ndarray, Tuple[LossBreakdown, ...]]:
    """Sum of per-scale losses, as the reference's AdvLossModel does
    (reference: code/yolo3/train.py:11-16). ``anchors`` is the full [9, 2]
    table; per-scale slices follow the anchor masks."""
    masks = anchor_masks_for(num_scales)
    anchors = jnp.asarray(anchors, jnp.float32)
    parts = []
    total = jnp.float32(0.0)
    for l in range(num_scales):
        part = yolo_loss_per_scale(
            yolo_outputs[l],
            y_trues[l],
            gt_boxes,
            gt_valid,
            anchors[jnp.asarray(masks[l])],
            GRID_STEPS[l],
            ignore_thresh=ignore_thresh,
            box_loss=box_loss,
            class_loss_kind=class_loss_kind,
        )
        parts.append(part)
        total = total + part.total
    return total, tuple(parts)
