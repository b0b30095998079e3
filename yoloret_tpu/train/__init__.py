from yoloret_tpu.train.losses import LossBreakdown, yolo_loss, yolo_loss_per_scale
from yoloret_tpu.train.freeze import (
    backbone_freeze_mask,
    freeze_partition_labels,
    make_frozen_optimizer,
)
from yoloret_tpu.train.step import (
    StepConfig,
    TrainState,
    cosine_lr_schedule,
    eval_step,
    make_jit_train_step,
    train_step,
)

__all__ = [
    "LossBreakdown",
    "yolo_loss",
    "yolo_loss_per_scale",
    "backbone_freeze_mask",
    "freeze_partition_labels",
    "make_frozen_optimizer",
    "StepConfig",
    "TrainState",
    "cosine_lr_schedule",
    "eval_step",
    "make_jit_train_step",
    "train_step",
]
