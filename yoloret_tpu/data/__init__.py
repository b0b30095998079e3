from yoloret_tpu.data.annotations import (
    load_anchors,
    load_annotation_lines,
    load_classes,
    parse_annotation_line,
)
from yoloret_tpu.data.augment import (
    AugmentConfig,
    augment_batch,
    mix_batch,
    eval_batch,
    hsv_to_rgb,
    rgb_to_hsv,
)
from yoloret_tpu.data.pipeline import Dataset, DatasetMode

__all__ = [
    "load_anchors",
    "load_annotation_lines",
    "load_classes",
    "parse_annotation_line",
    "AugmentConfig",
    "augment_batch",
    "mix_batch",
    "eval_batch",
    "hsv_to_rgb",
    "rgb_to_hsv",
    "Dataset",
    "DatasetMode",
]
