from yoloret_tpu.ops.boxes import giou, iou, pairwise_iou, wh_iou
from yoloret_tpu.ops.decode import (
    correct_boxes,
    decode_boxes,
    decode_scale,
    make_grid,
    xywh_to_corners,
)
from yoloret_tpu.ops.letterbox import letterbox_jax, letterbox_numpy, letterbox_params
from yoloret_tpu.ops.nms import NMSResult, class_aware_nms
from yoloret_tpu.ops.postprocess import (
    detect,
    detect_batch,
    gather_boxes_and_scores,
    shared_pool_candidates,
    shared_pool_suppress,
)
from yoloret_tpu.ops.targets import (
    ANCHOR_MASKS,
    GRID_STEPS,
    anchor_masks_for,
    assign_targets,
    assign_targets_batch,
    true_corner_boxes,
)

__all__ = [
    "giou",
    "iou",
    "pairwise_iou",
    "wh_iou",
    "correct_boxes",
    "decode_boxes",
    "decode_scale",
    "make_grid",
    "xywh_to_corners",
    "letterbox_jax",
    "letterbox_numpy",
    "letterbox_params",
    "NMSResult",
    "class_aware_nms",
    "detect",
    "detect_batch",
    "shared_pool_candidates",
    "shared_pool_suppress",
    "gather_boxes_and_scores",
    "ANCHOR_MASKS",
    "GRID_STEPS",
    "anchor_masks_for",
    "assign_targets",
    "assign_targets_batch",
    "true_corner_boxes",
]
