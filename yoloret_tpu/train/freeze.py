"""Truncated transfer learning as optimizer-level parameter partitions.

The reference implements backbone freezing by copying ImageNet weights
layer-by-layer and flipping ``layer.trainable`` up to a truncation point
(reference: code/yolo3/model.py:219-224, stage toggle at
code/train.py:153-216). The TPU-native equivalent keeps ONE parameter
pytree and trains with ``optax.multi_transform``: frozen leaves get
``set_to_zero`` updates, so the jitted train step stays identical across
stages — only the label pytree changes.

Depth ordering: MobileNetV2 blocks are ``block_0..block_16`` and
EfficientNet blocks ``stage_S_block_R`` (see nn/), so "truncate after
block k" — the paper's truncation-point experiments — is a name-prefix
predicate rather than a Keras layer scan.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional

import jax
import optax
from flax import traverse_util

TRAINABLE = "trainable"
FROZEN = "frozen"

_MNV2_BLOCK = re.compile(r"^block_(\d+)$")
_EFFNET_BLOCK = re.compile(r"^stage_(\d+)_block_(\d+)$")


def _block_depth(name: str) -> Optional[float]:
    """Depth key of a backbone submodule name; stem is -1, None if not a
    depth-ordered block."""
    if name == "stem":
        return -1.0
    m = _MNV2_BLOCK.match(name)
    if m:
        return float(m.group(1))
    m = _EFFNET_BLOCK.match(name)
    if m:
        return float(m.group(1)) * 100 + float(m.group(2))
    if name == "top":
        return float("inf")
    return None


def backbone_freeze_mask(
    params: Any,
    body_key: str = "body",
    upto_block: Optional[float] = None,
) -> Any:
    """Label pytree: FROZEN for backbone params, TRAINABLE elsewhere.

    Args:
      params: the detector's ``variables['params']`` pytree.
      body_key: top-level module name of the backbone inside YoloReT.
      upto_block: None freezes the whole backbone (the reference's main
        configs — layer_list[0] is the deepest layer); a number freezes
        stem + blocks with depth key <= upto_block (truncation study).
    """
    flat = traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        label = TRAINABLE
        if path[0] == body_key:
            if upto_block is None:
                label = FROZEN
            else:
                depth = _block_depth(path[1]) if len(path) > 1 else None
                if depth is not None and depth <= upto_block:
                    label = FROZEN
        labels[path] = label
    return traverse_util.unflatten_dict(labels)


def freeze_partition_labels(params: Any, predicate: Callable[[tuple], bool]) -> Any:
    """Generic label builder: ``predicate(path) -> True`` means frozen."""
    flat = traverse_util.flatten_dict(params)
    return traverse_util.unflatten_dict(
        {p: (FROZEN if predicate(p) else TRAINABLE) for p in flat}
    )


def make_frozen_optimizer(base_tx: optax.GradientTransformation, labels: Any):
    """Wrap an optimizer so FROZEN-labelled leaves receive zero updates."""
    return optax.multi_transform(
        {TRAINABLE: base_tx, FROZEN: optax.set_to_zero()}, labels
    )


def count_frozen(labels: Any) -> int:
    return sum(1 for l in jax.tree.leaves(labels) if l == FROZEN)
