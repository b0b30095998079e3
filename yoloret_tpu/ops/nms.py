"""Fixed-shape class-aware non-max suppression for TPU.

The reference runs a Python loop of ``tf.image.non_max_suppression`` over
classes on a flattened batch-1 box list (reference: code/yolo3/model.py:
468-491) — dynamic shapes, host-sequenced, batch-1 only. Here the whole
postprocess is one static-shape XLA program:

  1. per class, take the top-K candidate boxes by score (K static),
  2. run ``max_det`` greedy suppression steps as a `lax.fori_loop`; each
     step picks the per-class argmax and computes ONE [C, K] IoU row of
     the pick against its class pool to knock out overlaps.

IoU is evaluated lazily (max_det rows total) instead of materializing
the [C, K, K] matrix up front — C*K*max_det work and [C, K] live memory
instead of C*K^2, which keeps batched NMS HBM-resident at large batch.
All classes are processed in parallel (one vectorized loop of `max_det`
iterations total, not per class) and the result is a fixed-size
[C * max_det] detection list with a validity mask — jit/vmap friendly, so
batched NMS is just `jax.vmap`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from yoloret_tpu.ops.boxes import iou as box_iou


class NMSResult(NamedTuple):
    boxes: jnp.ndarray  # [C * max_det, 4] (ymin, xmin, ymax, xmax)
    scores: jnp.ndarray  # [C * max_det]
    classes: jnp.ndarray  # [C * max_det] int32
    valid: jnp.ndarray  # [C * max_det] bool


def class_aware_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    *,
    max_det_per_class: int = 20,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.6,
    num_candidates: int = 256,
    approx_topk: bool = True,
) -> NMSResult:
    """Per-class greedy NMS over a shared box list (single image).

    Args:
      boxes: [N, 4] (ymin, xmin, ymax, xmax), any consistent coordinate frame.
      scores: [N, C] per-class scores (objectness * class prob).
      max_det_per_class: per-class detection cap (reference default 20,
        code/yolo3/model.py:436,470).
      iou_threshold: suppression threshold (strictly-greater comparison, like
        tf.image.non_max_suppression).
      score_threshold: minimum score to emit a detection.
      num_candidates: static per-class candidate pool size K.
      approx_topk: use ``jax.lax.approx_max_k`` for candidate selection —
        the TPU-native partial-reduce top-k (much cheaper than the full
        sort ``lax.top_k`` lowers to). Recall target 0.95 over a pool
        many times deeper than the per-class detection cap, so misses
        are far-down candidates NMS would almost surely suppress.
        Lowers to exact top-k on CPU.

    Returns:
      NMSResult with fixed shape [C * max_det_per_class].
    """
    n, c = scores.shape
    k = min(num_candidates, n)

    # Per-class top-K candidate selection: [C, K].
    if approx_topk:
        cls_scores, cls_idx = jax.lax.approx_max_k(
            scores.T, k, recall_target=0.95
        )
    else:
        cls_scores, cls_idx = jax.lax.top_k(scores.T, k)  # scores.T: [C, N]
    cls_boxes = boxes[cls_idx]  # [C, K, 4]

    neg_inf = jnp.asarray(-jnp.inf, cls_scores.dtype)
    # tf.image.non_max_suppression prunes score < score_threshold (keeps ==).
    active = jnp.where(cls_scores >= score_threshold, cls_scores, neg_inf)

    out_boxes0 = jnp.zeros((c, max_det_per_class, 4), boxes.dtype)
    out_scores0 = jnp.full((c, max_det_per_class), neg_inf, cls_scores.dtype)

    lane = jax.lax.broadcasted_iota(jnp.int32, (c, k), 1)

    def step(i, carry):
        active, out_boxes, out_scores = carry
        # max + one-hot contraction instead of argmax + take_along_axis:
        # TPU gathers are scalar-unit bound, the einsum rides the MXU/VPU.
        best_score = jnp.max(active, axis=1)  # [C]
        best = jnp.argmax(active, axis=1)  # [C]
        onehot = (lane == best[:, None]).astype(cls_boxes.dtype)  # [C, K]
        best_box = jnp.einsum("ck,ckd->cd", onehot, cls_boxes)
        picked = best_score > neg_inf  # finite == a real pick

        out_boxes = out_boxes.at[:, i].set(jnp.where(picked[:, None], best_box, 0.0))
        out_scores = out_scores.at[:, i].set(jnp.where(picked, best_score, neg_inf))

        # Suppress: the pick itself and anything with IoU > threshold
        # (one lazy [C, K] IoU row per step).
        pick_iou = box_iou(best_box[:, None, :], cls_boxes)  # [C, K]
        kill = (pick_iou > iou_threshold) | (onehot > 0)
        active = jnp.where(picked[:, None] & kill, neg_inf, active)
        return active, out_boxes, out_scores

    _, out_boxes, out_scores = jax.lax.fori_loop(
        0, max_det_per_class, step, (active, out_boxes0, out_scores0)
    )

    out_classes = jax.lax.broadcasted_iota(jnp.int32, (c, max_det_per_class), 0)
    valid = out_scores > neg_inf
    m = c * max_det_per_class
    return NMSResult(
        boxes=out_boxes.reshape(m, 4),
        scores=jnp.where(valid, out_scores, 0.0).reshape(m),
        classes=out_classes.reshape(m),
        valid=valid.reshape(m),
    )
