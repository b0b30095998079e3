"""Fused Pallas TPU kernel for the greedy class-aware NMS loop.

The XLA path (ops/nms.py) runs ``max_det`` loop iterations whose carry
([C, K] activity mask + outputs) round-trips HBM between steps. This
kernel keeps the whole per-image problem — candidate scores and the
four box-coordinate planes — resident in VMEM for all iterations:
one grid program per image, everything VPU math, no HBM traffic inside
the loop.

Same semantics as ``class_aware_nms`` after its top-K candidate
selection: per class, repeatedly take the highest-scoring active
candidate (ties -> lowest index, matching argmax), emit it, and
deactivate every candidate with IoU strictly greater than the
threshold. Scores below ``score_threshold`` start inactive.

Layout notes (TPU tiling): boxes arrive as four separate [C, K] planes
so every operand is a clean (sublane, lane) tile; K should be a
multiple of 128.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


from yoloret_tpu.ops.nms import NMSResult

NEG = -1e30  # python scalar: jnp constants would be captured as consts


def _nms_kernel(
    scores_ref,  # [C, K] f32
    ymin_ref, xmin_ref, ymax_ref, xmax_ref,  # [C, K] f32 each
    out_scores_ref,  # [C, D] f32
    out_ymin_ref, out_xmin_ref, out_ymax_ref, out_xmax_ref,  # [C, D]
    *,
    max_det: int,
    out_width: int,
    iou_threshold: float,
    score_threshold: float,
):
    c, k = scores_ref.shape
    d = out_width  # lane-aligned (>= max_det); extra columns stay zero
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, k), 1)
    # Output column selector: Mosaic cannot prove dynamic lane-dim store
    # alignment, so outputs accumulate through one-hot selects instead of
    # ref[:, i] dynamic writes.
    col = jax.lax.broadcasted_iota(jnp.int32, (c, d), 1)

    y0 = ymin_ref[:]
    x0 = xmin_ref[:]
    y1 = ymax_ref[:]
    x1 = xmax_ref[:]
    w = jnp.maximum(0.0, x1 - x0)
    h = jnp.maximum(0.0, y1 - y0)
    area = w * h

    scores = scores_ref[:]
    active0 = jnp.where(scores >= score_threshold, scores, NEG)
    zeros_cd = jnp.zeros((c, d), jnp.float32)

    def step(i, carry):
        active, o_s, o_y0, o_x0, o_y1, o_x1 = carry
        best_score = jnp.max(active, axis=1)  # [C]
        # lowest index among maxima (argmax semantics)
        cand = jnp.where(active == best_score[:, None], lane, k)
        best_idx = jnp.min(cand, axis=1)  # [C]
        onehot = (lane == best_idx[:, None]).astype(jnp.float32)  # [C, K]
        picked = best_score > NEG

        by0 = jnp.sum(y0 * onehot, axis=1)
        bx0 = jnp.sum(x0 * onehot, axis=1)
        by1 = jnp.sum(y1 * onehot, axis=1)
        bx1 = jnp.sum(x1 * onehot, axis=1)
        barea = jnp.sum(area * onehot, axis=1)

        sel = (col == i) & picked[:, None]  # [C, D]
        o_s = jnp.where(sel, best_score[:, None], o_s)
        o_y0 = jnp.where(sel, by0[:, None], o_y0)
        o_x0 = jnp.where(sel, bx0[:, None], o_x0)
        o_y1 = jnp.where(sel, by1[:, None], o_y1)
        o_x1 = jnp.where(sel, bx1[:, None], o_x1)

        # IoU of the pick against its whole class pool (vector math).
        iy = jnp.maximum(0.0, jnp.minimum(y1, by1[:, None]) - jnp.maximum(y0, by0[:, None]))
        ix = jnp.maximum(0.0, jnp.minimum(x1, bx1[:, None]) - jnp.maximum(x0, bx0[:, None]))
        inter = ix * iy
        union = area + barea[:, None] - inter
        iou = jnp.where(union > 0, inter / jnp.where(union > 0, union, 1.0), 0.0)

        kill = (iou > iou_threshold) | (onehot > 0)
        active = jnp.where(picked[:, None] & kill, NEG, active)
        return active, o_s, o_y0, o_x0, o_y1, o_x1

    _, o_s, o_y0, o_x0, o_y1, o_x1 = jax.lax.fori_loop(
        0, max_det, step,
        (active0, zeros_cd, zeros_cd, zeros_cd, zeros_cd, zeros_cd),
    )
    out_scores_ref[:] = o_s
    out_ymin_ref[:] = o_y0
    out_xmin_ref[:] = o_x0
    out_ymax_ref[:] = o_y1
    out_xmax_ref[:] = o_x1


def nms_fused(
    cls_boxes: jnp.ndarray,  # [B, C, K, 4] (ymin, xmin, ymax, xmax)
    cls_scores: jnp.ndarray,  # [B, C, K]
    *,
    max_det_per_class: int = 20,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.6,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused NMS. Returns (boxes [B, C, D, 4], scores [B, C, D])
    with zero rows for empty slots."""
    b, c, k, _ = cls_boxes.shape
    d = max_det_per_class
    # Mosaic tiling: the sublane (class) dimension must be a multiple of
    # 8 for f32 blocks — pad with never-picked dummy classes and crop
    # after the kernel.
    c_pad = (-c) % 8
    if c_pad:
        cls_boxes = jnp.pad(cls_boxes, ((0, 0), (0, c_pad), (0, 0), (0, 0)))
        cls_scores = jnp.pad(
            cls_scores, ((0, 0), (0, c_pad), (0, 0)), constant_values=NEG
        )
    cp = c + c_pad
    # Candidate (lane) dimension must also be 128-aligned; pad with
    # never-picked entries (NEG scores, zero boxes).
    k_pad = (-k) % 128
    if k_pad:
        cls_boxes = jnp.pad(cls_boxes, ((0, 0), (0, 0), (0, k_pad), (0, 0)))
        cls_scores = jnp.pad(
            cls_scores, ((0, 0), (0, 0), (0, k_pad)), constant_values=NEG
        )
        k = k + k_pad
    dp = d + ((-d) % 128)  # lane dimension must be 128-aligned
    planes = tuple(cls_boxes[..., i] for i in range(4))  # 4 x [B, Cp, K]

    kernel = partial(
        _nms_kernel,
        max_det=d,
        out_width=dp,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    in_spec = pl.BlockSpec((1, cp, k), lambda i: (i, 0, 0))
    out_spec = pl.BlockSpec((1, cp, dp), lambda i: (i, 0, 0))

    def kernel3d(s, p0, p1, p2, p3, os, o0, o1, o2, o3):
        kernel(
            s.at[0], p0.at[0], p1.at[0], p2.at[0], p3.at[0],
            os.at[0], o0.at[0], o1.at[0], o2.at[0], o3.at[0],
        )

    outs = pl.pallas_call(
        kernel3d,
        grid=(b,),
        in_specs=[in_spec] * 5,
        out_specs=[out_spec] * 5,
        out_shape=[jax.ShapeDtypeStruct((b, cp, dp), jnp.float32)] * 5,
        interpret=interpret,
    )(cls_scores.astype(jnp.float32), *[p.astype(jnp.float32) for p in planes])

    out_scores, oy0, ox0, oy1, ox1 = outs
    out_boxes = jnp.stack([oy0, ox0, oy1, ox1], axis=-1)
    return out_boxes[:, :c, :d], out_scores[:, :c, :d]


def fused_result(
    out_boxes: jnp.ndarray, out_scores: jnp.ndarray
) -> NMSResult:
    """Flatten the fused kernel's [B, C, D] outputs into the NMSResult
    contract ([B, C*D] slate with validity)."""
    b, c, d, _ = out_boxes.shape
    classes = jax.lax.broadcasted_iota(jnp.int32, (b, c, d), 1)
    valid = out_scores > 0.0
    return NMSResult(
        boxes=out_boxes.reshape(b, c * d, 4),
        scores=out_scores.reshape(b, c * d),
        classes=classes.reshape(b, c * d),
        valid=valid.reshape(b, c * d),
    )
