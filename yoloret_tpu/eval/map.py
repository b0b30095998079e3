"""VOC-style mAP evaluation.

Same protocol as the reference ``MAPCallback`` (reference:
code/yolo3/map.py:10-248): per-class greedy matching of score-sorted
detections against per-image ground truth at IoU > threshold with
per-GT dedup (:157-221, +1-pixel VOC IoU convention :166-178), AP by
monotone precision-envelope integration — the VOC2010 "correct AP"
(:16-32) — and mAP as the class mean (:237-248).

The compute path differs: detections come from the batched on-device
decode+NMS (ops/postprocess.py) instead of a per-image Python loop over
``tf.image.non_max_suppression``; only the final AP bookkeeping runs on
host numpy.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def voc_ap(recall: np.ndarray, precision: np.ndarray) -> float:
    """Area under the monotone precision envelope
    (reference: code/yolo3/map.py:16-32)."""
    mrec = np.concatenate(([0.0], recall, [1.0]))
    mpre = np.concatenate(([0.0], precision, [0.0]))
    for i in range(mpre.size - 1, 0, -1):
        mpre[i - 1] = np.maximum(mpre[i - 1], mpre[i])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


class MAPEvaluator:
    """Streaming accumulator: feed per-image detections + ground truth,
    then ``compute()`` per-class APs (at the single VOC threshold) or
    ``compute_range()`` for COCO-style mAP@[.5:.95].

    Boxes are (x1, y1, x2, y2) in original-image pixels.
    """

    def __init__(self, num_classes: int, iou_threshold: float = 0.5):
        self.num_classes = num_classes
        self.iou = iou_threshold
        self._preds: List[Tuple[int, int, float, np.ndarray]] = []
        self._gt: Dict[int, np.ndarray] = {}  # image idx -> [N, 5] (x1,y1,x2,y2,cls)
        self._next_idx = 0

    def add_image(
        self,
        pred_boxes: np.ndarray,  # [M, 4] (x1, y1, x2, y2)
        pred_scores: np.ndarray,  # [M]
        pred_classes: np.ndarray,  # [M]
        gt: np.ndarray,  # [N, 5] (x1, y1, x2, y2, cls)
    ) -> int:
        idx = self._next_idx
        self._next_idx += 1
        for b, s, c in zip(pred_boxes, pred_scores, pred_classes):
            self._preds.append((idx, int(c), float(s), np.asarray(b, float)))
        self._gt[idx] = np.asarray(gt, float).reshape(-1, 5)
        return idx

    def compute_range(self, thresholds=None) -> float:
        """COCO-style mAP averaged over IoU thresholds .5:.05:.95 —
        an extension beyond the reference's single-threshold VOC AP."""
        if thresholds is None:
            thresholds = np.arange(0.5, 0.96, 0.05)
        keep = self.iou
        vals = []
        try:
            for t in thresholds:
                # VOC matching uses strict >, COCO uses >=; subtract a hair.
                self.iou = float(t) - 1e-9
                aps = self.compute()
                vals.append(np.mean(list(aps.values())) if aps else 0.0)
        finally:
            self.iou = keep
        return float(np.mean(vals))

    def compute(self) -> Dict[int, float]:
        aps: Dict[int, float] = {}
        for cls in range(self.num_classes):
            preds = [p for p in self._preds if p[1] == cls]
            if not preds:
                aps[cls] = 0.0
                continue
            npos = 0
            gt_cls: Dict[int, dict] = {}
            for idx, g in self._gt.items():
                rows = g[g[:, 4] == cls]
                npos += len(rows)
                gt_cls[idx] = {"bbox": rows[:, :4], "det": [False] * len(rows)}

            order = np.argsort([-p[2] for p in preds])
            tp = np.zeros(len(preds))
            fp = np.zeros(len(preds))
            for rank, pi in enumerate(order):
                idx, _, _, box = preds[pi]
                res = gt_cls[idx]
                bbgt = res["bbox"]
                ovmax, jmax = -np.inf, -1
                if bbgt.size > 0:
                    ixmin = np.maximum(bbgt[:, 0], box[0])
                    iymin = np.maximum(bbgt[:, 1], box[1])
                    ixmax = np.minimum(bbgt[:, 2], box[2])
                    iymax = np.minimum(bbgt[:, 3], box[3])
                    iw = np.maximum(ixmax - ixmin + 1.0, 0.0)
                    ih = np.maximum(iymax - iymin + 1.0, 0.0)
                    inter = iw * ih
                    union = (
                        (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
                        + (bbgt[:, 2] - bbgt[:, 0] + 1.0) * (bbgt[:, 3] - bbgt[:, 1] + 1.0)
                        - inter
                    )
                    overlaps = inter / union
                    ovmax = float(np.max(overlaps))
                    jmax = int(np.argmax(overlaps))
                if ovmax > self.iou and not res["det"][jmax]:
                    tp[rank] = 1.0
                    res["det"][jmax] = True
                else:
                    fp[rank] = 1.0

            fp = np.cumsum(fp)
            tp = np.cumsum(tp)
            rec = tp / np.maximum(float(npos), np.finfo(np.float64).eps)
            prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
            aps[cls] = voc_ap(rec, prec)
        return aps


def _infer_detect(
    model, variables, images, image_hw, anchors, *,
    num_classes, score_threshold, nms_iou,
    num_candidates=256, pool=None, approx_topk=True,
):
    import jax

    from yoloret_tpu.ops import detect_batch

    from yoloret_tpu.ops.postprocess import COMPILE_CLIFF_BM

    global _INFER_JIT, _CAND_JIT, _SUP_JIT
    # Above the XLA-TPU compile cliff in batch*num_candidates, jit the
    # shared-pool pipeline as TWO programs (model+candidates /
    # suppression): compiles in seconds instead of 330-920 s and
    # measured FASTER (13.3k vs 12.8k img/s at b128/M512) —
    # tools/compile_split.py, tests/test_postprocess_oracle.py proves
    # the split bitwise-equal to the fused program.
    if (pool in (None, "shared")
            and images.shape[0] * num_candidates > COMPILE_CLIFF_BM):
        from yoloret_tpu.ops import shared_pool_candidates, shared_pool_suppress

        if _CAND_JIT is None:
            def cand(model, variables, images, image_hw, anchors,
                     num_classes, num_candidates, approx_topk):
                outs = model.apply(variables, images, False)
                return shared_pool_candidates(
                    outs, anchors, num_classes, image_hw,
                    num_candidates=num_candidates, approx_topk=approx_topk,
                )
            _CAND_JIT = jax.jit(
                cand, static_argnums=(0, 5),
                static_argnames=("num_candidates", "approx_topk"),
            )
            _SUP_JIT = jax.jit(
                shared_pool_suppress,
                static_argnames=("score_threshold", "iou_threshold",
                                 "max_det_per_class"),
            )
        boxes, cls_scores = _CAND_JIT(
            model, variables, images, image_hw, anchors, num_classes,
            num_candidates=num_candidates, approx_topk=approx_topk,
        )
        return _SUP_JIT(
            boxes, cls_scores,
            score_threshold=score_threshold, iou_threshold=nms_iou,
        )
    if _INFER_JIT is None:
        def fn(model, variables, images, image_hw, anchors,
               num_classes, score_threshold, nms_iou,
               num_candidates, pool, approx_topk):
            outs = model.apply(variables, images, False)
            return detect_batch(
                outs, anchors, num_classes=num_classes, image_hw=image_hw,
                score_threshold=score_threshold, iou_threshold=nms_iou,
                num_candidates=num_candidates, pool=pool,
                approx_topk=approx_topk,
            )
        _INFER_JIT = jax.jit(
            fn,
            static_argnums=(0, 5),
            static_argnames=(
                "score_threshold", "nms_iou", "num_candidates", "pool",
                "approx_topk",
            ),
        )
    return _INFER_JIT(
        model, variables, images, image_hw, anchors, num_classes,
        score_threshold=score_threshold, nms_iou=nms_iou,
        num_candidates=num_candidates, pool=pool, approx_topk=approx_topk,
    )


_INFER_JIT = None
_CAND_JIT = None
_SUP_JIT = None


def evaluate_map(
    model,
    variables,
    dataset,
    anchors: np.ndarray,
    class_names: Sequence[str],
    *,
    score_threshold: float = 0.0,
    iou_threshold: float = 0.5,
    nms_iou: float = 0.5,
    max_batches: Optional[int] = None,
    verbose: bool = True,
    mesh=None,
    num_candidates: int = 512,
    pool: Optional[str] = None,
    approx_topk: bool = True,
) -> Tuple[float, Dict[int, float]]:
    """Run the model over an eval Dataset (data/pipeline.py, TEST mode)
    and return (mAP, per-class APs) — the ``--mode=MAP`` driver
    (reference: code/yolo.py:397-405). Prints per-image latency like the
    reference (map.py:155-156). With ``mesh``, batches shard over the
    ``data`` axis so evaluation scales across chips.

    Candidate-selection defaults (shared pool M=512, approx top-k) were
    chosen by measurement: on a crowded 4-class synthetic at partial
    convergence, approx vs exact top-k costs 0.0000 mAP in every
    configuration and the shared pool costs 0.0000 at M=512 (-0.003 at
    256, -0.013 at 64) — tools/topk_study.py, table in docs/design.md.
    ``pool='per_class', approx_topk=False, num_candidates=<grid size>``
    reproduces the reference's exact per-class NMS bit-for-bit
    (tests/test_postprocess_oracle.py)."""
    import jax
    import jax.numpy as jnp

    num_classes = len(class_names)
    anchors_j = jnp.asarray(anchors, jnp.float32)

    put = lambda x: x
    if mesh is not None:
        from yoloret_tpu.parallel import DATA_AXIS, batch_sharding, replicate

        n_data = int(mesh.shape[DATA_AXIS])
        if dataset.batch_size % n_data:
            # Fail here with a clear message instead of an opaque GSPMD
            # sharding error deep inside device_put (advisor, round 3).
            raise ValueError(
                f"batch_size ({dataset.batch_size}) must be a multiple of "
                f"the mesh data axis ({n_data}) for sharded evaluation; "
                f"pass --batch_size k*{n_data} or reduce --mesh_data"
            )
        data_shard = batch_sharding(mesh)
        variables = jax.tree.map(
            lambda x: jax.device_put(x, replicate(mesh)), variables
        )
        put = lambda x: jax.device_put(x, data_shard)

    # Module-level jit (Flax modules hash by config) so repeated calls —
    # e.g. the trainer's --map_every evaluations — reuse the compiled
    # program instead of recompiling per call.
    infer = lambda variables, images, image_hw: _infer_detect(
        model, variables, images, image_hw, anchors_j,
        num_classes=num_classes,
        score_threshold=score_threshold,
        nms_iou=nms_iou,
        num_candidates=num_candidates,
        pool=pool,
        approx_topk=approx_topk,
    )

    ev = MAPEvaluator(num_classes, iou_threshold)
    n_images = 0
    t0 = time.perf_counter()
    for bi, batch in enumerate(dataset.build(epochs=1)):
        if max_batches is not None and bi >= max_batches:
            break
        res = infer(variables, put(batch["images"]), put(batch["image_hw"]))
        boxes = np.asarray(res.boxes)  # [B, M, 4] (ymin, xmin, ymax, xmax)
        scores = np.asarray(res.scores)
        classes = np.asarray(res.classes)
        valid = np.asarray(res.valid)
        gt = np.asarray(batch["orig_boxes"])
        gt_valid = np.asarray(batch["orig_valid"])
        n_real = int(batch.get("n_valid", boxes.shape[0]))
        for i in range(n_real):  # skip pad rows of the final partial batch
            m = valid[i]
            xyxy = boxes[i][m][:, [1, 0, 3, 2]]  # -> (x1, y1, x2, y2)
            ev.add_image(xyxy, scores[i][m], classes[i][m], gt[i][gt_valid[i]])
            n_images += 1
    dt = time.perf_counter() - t0
    if verbose and n_images:
        print(f"eval: {n_images} images, {dt / n_images * 1e3:.2f} ms/image")

    aps = ev.compute()
    for cls, ap in aps.items():
        if verbose:
            print(f"{class_names[cls]} ap: {ap:.4f}")
    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    if verbose:
        print(f"mAP: {mean_ap:.4f}")
    return mean_ap, aps
