"""End-to-end detection postprocess: raw multi-scale head outputs -> final
(boxes, scores, classes) in original-image pixel coordinates.

This is the TPU-native replacement for the reference ``yolo_eval``
(reference: code/yolo3/model.py:431-491): decode every scale, undo the
letterbox, per-class NMS with a 20-per-class cap — but batched, fixed-shape,
and fully on-device as one XLA program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from yoloret_tpu.ops.decode import correct_boxes, decode_scale
from yoloret_tpu.ops.nms import NMSResult, class_aware_nms

from yoloret_tpu.ops.targets import anchor_masks_for


def gather_boxes_and_scores(
    outputs: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray,
    zoom_outputs: Optional[Sequence[jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode + letterbox-correct all scales for ONE image.

    Args:
      outputs: per-scale raw heads, each [gh, gw, A, 5+C] (coarsest first).
      anchors: [9, 2] (w, h) pixels.
      num_classes: C.
      image_hw: [2] float (H_img, W_img).
      zoom_outputs: optional per-scale heads from a second pass over the
        CENTER CROP of the network input (the reference's experimental
        zoom-in ensemble, code/yolo3/model.py:408-422 / yolo.py:154-161);
        their boxes are rescaled into the primary input frame and
        concatenated before NMS.

    Returns:
      boxes [N, 4] (ymin,xmin,ymax,xmax) in image pixels; scores [N, C].
    """
    num_scales = len(outputs)
    masks = anchor_masks_for(num_scales)
    # Network input inferred from the coarsest grid: reference multiplies the
    # stride-32 grid by 32 (code/yolo3/model.py:449).
    input_hw = (outputs[0].shape[-4] * 32, outputs[0].shape[-3] * 32)
    # Zoom-crop size likewise from ITS coarsest grid only — per-scale
    # grids have strides 32/16/8, so grid*32 is wrong for l > 0.
    if zoom_outputs is not None:
        zoom_hw = (zoom_outputs[0].shape[-4] * 32, zoom_outputs[0].shape[-3] * 32)

    all_boxes, all_scores = [], []
    for l in range(num_scales):
        feats = outputs[l].astype(jnp.float32)
        xy, wh, obj, probs = decode_scale(feats, anchors[jnp.asarray(masks[l])], input_hw)
        if zoom_outputs is not None:
            zfeats = zoom_outputs[l].astype(jnp.float32)
            zxy, zwh, zobj, zprobs = decode_scale(
                zfeats, anchors[jnp.asarray(masks[l])], zoom_hw
            )
            # Map crop-frame coords into the primary frame
            # (reference model.py:411-417: xy*(z/in) + (in-z)/(2*in)).
            ratio = jnp.asarray(
                [zoom_hw[1] / input_hw[1], zoom_hw[0] / input_hw[0]], jnp.float32
            )
            offset = (1.0 - ratio) / 2.0
            zxy = zxy * ratio + offset
            zwh = zwh * ratio
            flat = lambda a, b: jnp.concatenate([a.reshape(-1, a.shape[-1]), b.reshape(-1, b.shape[-1])])
            xy = flat(xy, zxy)
            wh = flat(wh, zwh)
            obj = flat(obj, zobj)
            probs = flat(probs, zprobs)
        boxes = correct_boxes(xy, wh, input_hw, image_hw)
        all_boxes.append(boxes.reshape(-1, 4))
        all_scores.append((obj * probs).reshape(-1, num_classes))
    return jnp.concatenate(all_boxes, axis=0), jnp.concatenate(all_scores, axis=0)


def detect(
    outputs: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray,
    *,
    max_det_per_class: int = 20,
    score_threshold: float = 0.6,
    iou_threshold: float = 0.5,
    num_candidates: int = 256,
    zoom_outputs: Optional[Sequence[jnp.ndarray]] = None,
    approx_topk: bool = True,
) -> NMSResult:
    """Single-image postprocess (unbatched head outputs)."""
    boxes, scores = gather_boxes_and_scores(
        outputs, anchors, num_classes, image_hw, zoom_outputs=zoom_outputs
    )
    return class_aware_nms(
        boxes,
        scores,
        max_det_per_class=max_det_per_class,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        num_candidates=num_candidates,
        approx_topk=approx_topk,
    )


def detect_batch(
    outputs: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray,
    *,
    max_det_per_class: int = 20,
    score_threshold: float = 0.6,
    iou_threshold: float = 0.5,
    num_candidates: int = 256,
    zoom_outputs: Optional[Sequence[jnp.ndarray]] = None,
    use_pallas: Optional[bool] = None,
    pool: Optional[str] = None,
    approx_topk: bool = True,
) -> NMSResult:
    """Batched postprocess: outputs [B, gh, gw, A, 5+C] per scale,
    image_hw [B, 2]. Returns NMSResult with leading batch dim.

    ``pool`` selects the candidate structure:
      * ``"per_class"`` — per-class top-K over all positions, then
        per-class suppression (exactly the reference's NMS semantics
        when K covers the grid).
      * ``"shared"`` — ONE top-M over positions ranked by their best
        class score (max_c sigmoid(l_c) == sigmoid(max_c l_c), so the
        ranking needs no [B, N, C] materialization), then box decode
        ONCE per position and per-class suppression over the shared
        pool. Cuts the dominant per-class top-k scan by C× and the
        candidate gather/decode by C×; a class's candidate can only be
        missed if M positions of globally-higher-scoring OTHER classes
        crowd it out (measured mAP-neutral at M=256 — docs/design.md).
      * None — "shared" (the measured-fastest default; flip to
        "per_class" to reproduce reference candidate semantics at
        small pools).

    ``approx_topk=False`` replaces ``jax.lax.approx_max_k`` (recall
    0.95) with exact ``lax.top_k`` in the candidate selection.

    ``use_pallas=True`` routes the per-class structure through the
    fused VMEM-resident suppression kernel (ops/nms_pallas.py).
    """
    if use_pallas is None:
        use_pallas = False
    if pool is None:
        # pool choice is independent of HOW use_pallas was spelled:
        # "shared" is the measured-fastest default whenever it applies;
        # the Pallas kernel and the zoom ensemble require the per-class
        # candidate structure.
        pool = "per_class" if (use_pallas or zoom_outputs is not None) else "shared"
    elif pool == "shared" and (use_pallas or zoom_outputs is not None):
        raise ValueError(
            "pool='shared' is incompatible with use_pallas=True / "
            "zoom_outputs: both consume the per-class candidate structure "
            "(pass pool='per_class' or drop them)")
    if pool == "shared" and zoom_outputs is None and not use_pallas:
        # Compile-time note (round 3, measured): XLA-TPU's backend
        # passes fall off a compile cliff on this program when
        # batch * num_candidates > COMPILE_CLIFF_BM — b128/M512 compiled
        # in 330-920 s (server-load-dependent) while b32/M512 took 8.6 s
        # and b128/M256 7.4 s; the same HLO compiles for CPU in 6 s, and
        # the suppression loop and top-k each compile in seconds in
        # isolation. Chunking the batch through lax.map did NOT dodge
        # the cliff (557-778 s) and cost 13-25% runtime, so it was
        # reverted. THE FIX: jit shared_pool_candidates and
        # shared_pool_suppress as two separate programs (seconds to
        # compile, measured faster — tools/compile_split.py); the eval
        # path does this automatically. In-one-program escape:
        # num_candidates=256 (measured -0.003 mAP on the crowded
        # synthetic, tools/topk_study.py).
        return _detect_batch_shared_pool(
            outputs, anchors, num_classes, image_hw,
            max_det_per_class=max_det_per_class,
            score_threshold=score_threshold,
            iou_threshold=iou_threshold,
            num_candidates=num_candidates,
            approx_topk=approx_topk,
        )
    if use_pallas and zoom_outputs is None:
        return _detect_batch_candidates(
            outputs, anchors, num_classes, image_hw,
            max_det_per_class=max_det_per_class,
            score_threshold=score_threshold,
            iou_threshold=iou_threshold,
            num_candidates=num_candidates,
            use_pallas=True,
            approx_topk=approx_topk,
        )
    if zoom_outputs is None:
        fn = lambda outs, hw: detect(
            outs,
            anchors,
            num_classes,
            hw,
            max_det_per_class=max_det_per_class,
            score_threshold=score_threshold,
            iou_threshold=iou_threshold,
            num_candidates=num_candidates,
            approx_topk=approx_topk,
        )
        return jax.vmap(fn)(tuple(outputs), image_hw)
    fn = lambda outs, zouts, hw: detect(
        outs,
        anchors,
        num_classes,
        hw,
        max_det_per_class=max_det_per_class,
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
        num_candidates=num_candidates,
        zoom_outputs=zouts,
        approx_topk=approx_topk,
    )
    return jax.vmap(fn)(tuple(outputs), tuple(zoom_outputs), image_hw)


def _position_constants(outputs: Sequence[jnp.ndarray], anchors: jnp.ndarray):
    """Per flattened head position: (grid_xy [N,2], grid_wh [N,2],
    anchor_wh [N,2]) — compile-time constants enabling candidate-only
    box decode after top-k."""
    from yoloret_tpu.ops.decode import make_grid

    masks = anchor_masks_for(len(outputs))
    gxs, gws, aws = [], [], []
    for l, o in enumerate(outputs):
        gh, gw, a = o.shape[-4], o.shape[-3], o.shape[-2]
        grid = jnp.broadcast_to(make_grid(gh, gw), (gh, gw, a, 2)).reshape(-1, 2)
        gxs.append(grid)
        gws.append(jnp.broadcast_to(jnp.asarray([gw, gh], jnp.float32), grid.shape))
        anc = jnp.broadcast_to(
            anchors[jnp.asarray(masks[l])].reshape(1, 1, a, 2), (gh, gw, a, 2)
        ).reshape(-1, 2)
        aws.append(anc)
    return (
        jnp.concatenate(gxs),
        jnp.concatenate(gws),
        jnp.concatenate(aws),
    )


def _suppress_lax(
    cls_boxes: jnp.ndarray,  # [B, C, K, 4]
    cls_scores: jnp.ndarray,  # [B, C, K]
    *,
    max_det: int,
    iou_threshold: float,
    score_threshold: float,
):
    """Batched greedy suppression over per-class candidate pools — the
    XLA twin of the Pallas kernel (same math, jnp over a leading batch
    axis). Returns (boxes [B, C, D, 4], scores [B, C, D])."""
    from yoloret_tpu.ops.boxes import iou as box_iou

    b, c, k = cls_scores.shape
    neg_inf = jnp.asarray(-jnp.inf, cls_scores.dtype)
    active0 = jnp.where(cls_scores >= score_threshold, cls_scores, neg_inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, c, k), 2)
    out_b0 = jnp.zeros((b, c, max_det, 4), jnp.float32)
    out_s0 = jnp.zeros((b, c, max_det), jnp.float32)

    def step(i, carry):
        active, ob, os_ = carry
        best_score = jnp.max(active, axis=-1)  # [B, C]
        best = jnp.argmax(active, axis=-1)  # [B, C]
        onehot = (lane == best[..., None]).astype(jnp.float32)  # [B, C, K]
        best_box = jnp.einsum("bck,bckd->bcd", onehot, cls_boxes)
        picked = best_score > neg_inf
        ob = ob.at[:, :, i].set(jnp.where(picked[..., None], best_box, 0.0))
        os_ = os_.at[:, :, i].set(jnp.where(picked, best_score, 0.0))
        pick_iou = box_iou(best_box[:, :, None, :], cls_boxes)  # [B, C, K]
        kill = (pick_iou > iou_threshold) | (onehot > 0)
        active = jnp.where(picked[..., None] & kill, neg_inf, active)
        return active, ob, os_

    _, out_boxes, out_scores = jax.lax.fori_loop(
        0, max_det, step, (active0, out_b0, out_s0)
    )
    return out_boxes, out_scores


def _detect_batch_candidates(
    outputs: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray,
    *,
    max_det_per_class: int,
    score_threshold: float,
    iou_threshold: float,
    num_candidates: int,
    use_pallas: bool,
    approx_topk: bool = True,
) -> NMSResult:
    """scores (full grid) -> per-class top-k -> candidate-ONLY box decode
    -> greedy suppression (Pallas kernel or batched lax loop).

    Box decode and letterbox inversion run on the K candidates per class
    instead of all N positions, skipping the full [B, N, 4] box
    materialization."""
    from yoloret_tpu.ops.decode import correct_boxes
    from yoloret_tpu.ops.nms_pallas import fused_result, nms_fused

    input_hw = (outputs[0].shape[-4] * 32, outputs[0].shape[-3] * 32)
    b = outputs[0].shape[0]

    # Scores for ALL positions: [B, N, C] -> [B, C, N].
    raw_flat = jnp.concatenate(
        [o.astype(jnp.float32).reshape(b, -1, o.shape[-1]) for o in outputs], axis=1
    )  # [B, N, 5+C]
    scores = jax.nn.sigmoid(raw_flat[..., 4:5]) * jax.nn.sigmoid(raw_flat[..., 5:])
    n = scores.shape[1]
    k = min(num_candidates, n)
    if approx_topk:
        cls_scores, cls_idx = jax.lax.approx_max_k(
            scores.transpose(0, 2, 1), k, recall_target=0.95
        )  # [B, C, K]
    else:
        cls_scores, cls_idx = jax.lax.top_k(scores.transpose(0, 2, 1), k)

    # Candidate-only decode: gather raw box params + position constants.
    grid_xy, grid_wh, anchor_wh = _position_constants(outputs, anchors)
    cand_raw = jnp.take_along_axis(
        raw_flat[:, None, :, :4], cls_idx[..., None], axis=2
    )  # [B, C, K, 4]
    cand_grid = grid_xy[cls_idx]  # [B, C, K, 2]
    cand_gwh = grid_wh[cls_idx]
    cand_anchor = anchor_wh[cls_idx]
    wh_in = jnp.asarray([input_hw[1], input_hw[0]], jnp.float32)
    xy = (jax.nn.sigmoid(cand_raw[..., :2]) + cand_grid) / cand_gwh
    wh = jnp.exp(cand_raw[..., 2:4]) * cand_anchor / wh_in
    cls_boxes = correct_boxes(xy, wh, input_hw, image_hw[:, None, None, :])

    if use_pallas:
        out_boxes, out_scores = nms_fused(
            cls_boxes,
            cls_scores,
            max_det_per_class=max_det_per_class,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
        )
    else:
        out_boxes, out_scores = _suppress_lax(
            cls_boxes,
            cls_scores,
            max_det=max_det_per_class,
            iou_threshold=iou_threshold,
            score_threshold=score_threshold,
        )
    return fused_result(out_boxes, out_scores)


def _suppress_lax_shared(
    boxes: jnp.ndarray,  # [B, M, 4] — ONE box set shared by all classes
    cls_scores: jnp.ndarray,  # [B, C, M]
    *,
    max_det: int,
    iou_threshold: float,
    score_threshold: float,
):
    """Greedy per-class suppression over a SHARED candidate pool. YOLO
    boxes are class-independent, so the [B, M, 4] set broadcasts over
    the class axis — no per-class box duplication in HBM."""
    from yoloret_tpu.ops.boxes import iou as box_iou

    b, c, m = cls_scores.shape
    neg_inf = jnp.asarray(-jnp.inf, cls_scores.dtype)
    active0 = jnp.where(cls_scores >= score_threshold, cls_scores, neg_inf)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, c, m), 2)
    out_b0 = jnp.zeros((b, c, max_det, 4), jnp.float32)
    out_s0 = jnp.zeros((b, c, max_det), jnp.float32)

    def step(i, carry):
        active, ob, os_ = carry
        best_score = jnp.max(active, axis=-1)  # [B, C]
        best = jnp.argmax(active, axis=-1)  # [B, C]
        onehot = (lane == best[..., None]).astype(jnp.float32)  # [B, C, M]
        best_box = jnp.einsum("bcm,bmd->bcd", onehot, boxes)
        picked = best_score > neg_inf
        ob = ob.at[:, :, i].set(jnp.where(picked[..., None], best_box, 0.0))
        os_ = os_.at[:, :, i].set(jnp.where(picked, best_score, 0.0))
        pick_iou = box_iou(best_box[:, :, None, :], boxes[:, None, :, :])  # [B, C, M]
        kill = (pick_iou > iou_threshold) | (onehot > 0)
        active = jnp.where(picked[..., None] & kill, neg_inf, active)
        return active, ob, os_

    _, out_boxes, out_scores = jax.lax.fori_loop(
        0, max_det, step, (active0, out_b0, out_s0)
    )
    return out_boxes, out_scores


# batch * num_candidates above which the FUSED shared-pool program hits
# the XLA-TPU backend-pass compile cliff (measured round 3: b128*M256 =
# 32768 compiles in 7.4 s, b128*M512 = 65536 in 330-920 s server-side).
# Callers that jit the two stage functions below as separate programs
# dodge it entirely (24.8 s + 6.4 s at the cliff config, and the split
# measured FASTER end to end — tools/compile_split.py).
COMPILE_CLIFF_BM = 32768


def shared_pool_candidates(
    outputs: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray,
    *,
    num_candidates: int,
    approx_topk: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate-selection half of the shared-pool postprocess: ONE
    top-M over positions (ranked by best class score) -> box decode ONCE
    per candidate. Returns (boxes [B, M, 4] in image pixels,
    cls_scores [B, C, M]).

    Exposed separately from :func:`shared_pool_suppress` so callers can
    jit the two halves as SEPARATE XLA programs: the fused program hits
    an XLA-TPU backend-pass compile cliff at large batch*num_candidates
    (330-920 s at b128/M512) that the two halves, compiled in
    isolation, do not (see the note in :func:`detect_batch`).

    vs the per-class structure this removes the dominant [B, C, N]
    top-k scan (C× less scanning), decodes [B, M, 4] boxes instead of
    [B, C, K, 4], and gathers M rows instead of C*K. Position ranking
    uses max_c(sigmoid(obj) * sigmoid(l_c)) = sigmoid(obj) *
    sigmoid(max_c l_c), so no [B, N, C] score tensor is materialized
    before the gather."""
    from yoloret_tpu.ops.decode import correct_boxes

    input_hw = (outputs[0].shape[-4] * 32, outputs[0].shape[-3] * 32)
    b = outputs[0].shape[0]

    # Flat [B, N, 5+C] concat + dense gather. A round-3 experiment
    # replaced this with fused per-scale score reduction + sparse
    # per-scale gathers to cut the concat's HBM copy — measured SLOWER
    # (15.0k vs 15.6k img/s at the b128/u8 serving config; XLA's
    # program for the 3-way gather+select moved MORE bytes). Kept flat.
    #
    # Byte diet (round 5): the concat keeps the HEAD dtype instead of
    # force-casting to f32 — bf16 heads carry no extra information, so
    # casting AFTER the M-row gather is bitwise-identical (f32(bf16) is
    # exact, max is monotone under the cast) while the dominant [B, N,
    # 5+C] materialization + rank-reduction read move half the bytes.
    # Ranking sigmoids still run in f32 on the [B, N] reductions.
    dt = jnp.result_type(*[o.dtype for o in outputs])
    raw_flat = jnp.concatenate(
        [o.astype(dt).reshape(b, -1, o.shape[-1]) for o in outputs], axis=1
    )  # [B, N, 5+C], head dtype
    n = raw_flat.shape[1]
    m = min(num_candidates, n)

    best_logit = jnp.max(raw_flat[..., 5:], axis=-1).astype(jnp.float32)  # [B, N]
    obj_logit = raw_flat[..., 4].astype(jnp.float32)
    shared_score = jax.nn.sigmoid(obj_logit) * jax.nn.sigmoid(best_logit)
    if approx_topk and m < n:
        _, idx = jax.lax.approx_max_k(shared_score, m, recall_target=0.95)
    else:
        _, idx = jax.lax.top_k(shared_score, m)  # [B, M]

    cand_raw = jnp.take_along_axis(raw_flat, idx[..., None], axis=1).astype(
        jnp.float32
    )  # [B, M, 5+C]
    cls_scores = (
        jax.nn.sigmoid(cand_raw[..., 4:5]) * jax.nn.sigmoid(cand_raw[..., 5:])
    ).transpose(0, 2, 1)  # [B, C, M]

    grid_xy, grid_wh, anchor_wh = _position_constants(outputs, anchors)
    cand_grid = grid_xy[idx]  # [B, M, 2]
    cand_gwh = grid_wh[idx]
    cand_anchor = anchor_wh[idx]
    wh_in = jnp.asarray([input_hw[1], input_hw[0]], jnp.float32)
    xy = (jax.nn.sigmoid(cand_raw[..., :2]) + cand_grid) / cand_gwh
    wh = jnp.exp(cand_raw[..., 2:4]) * cand_anchor / wh_in
    boxes = correct_boxes(xy, wh, input_hw, image_hw[:, None, :])  # [B, M, 4]
    return boxes, cls_scores


def shared_pool_suppress(
    boxes: jnp.ndarray,
    cls_scores: jnp.ndarray,
    *,
    max_det_per_class: int = 20,
    score_threshold: float = 0.6,
    iou_threshold: float = 0.5,
) -> NMSResult:
    """Suppression half of the shared-pool postprocess: per-class greedy
    NMS over the shared candidate set from
    :func:`shared_pool_candidates` (boxes [B, M, 4],
    cls_scores [B, C, M])."""
    from yoloret_tpu.ops.nms_pallas import fused_result

    out_boxes, out_scores = _suppress_lax_shared(
        boxes,
        cls_scores,
        max_det=max_det_per_class,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
    return fused_result(out_boxes, out_scores)


def _detect_batch_shared_pool(
    outputs: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,
    num_classes: int,
    image_hw: jnp.ndarray,
    *,
    max_det_per_class: int,
    score_threshold: float,
    iou_threshold: float,
    num_candidates: int,
    approx_topk: bool,
) -> NMSResult:
    """Fused shared-pool postprocess: candidates + suppression in one
    traced graph (see the two stage functions above)."""
    boxes, cls_scores = shared_pool_candidates(
        outputs, anchors, num_classes, image_hw,
        num_candidates=num_candidates, approx_topk=approx_topk,
    )
    return shared_pool_suppress(
        boxes, cls_scores,
        max_det_per_class=max_det_per_class,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
    )
