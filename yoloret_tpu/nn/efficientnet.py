"""EfficientNet B0-B7 backbone family, NHWC Flax.

Re-designed from the vendored qubvel implementation the reference ships
(reference: code/yolo3/efficientnet.py): block-string stage table
(:208-216), width/depth rounding (:364-388), MBConv assembly (:467-536),
stem/head (:611-710), per-block linear drop-connect schedule (:648-678).

Detector taps are the stage-end outputs that correspond to the Keras
``add_N`` layer names the reference reads (code/yolo3/model.py:213-217):
for B3 — add_17 == end of stage 6 (/32), add_12 == end of stage 5 (/16),
add_4 == end of stage 3 (/8), add_2 == end of stage 2 (/4). Those map to
stage-end features for every B-variant, which is what we return.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.layers import ConvBN, MBConv, swish


@dataclasses.dataclass(frozen=True)
class BlockArgs:
    """Decoded equivalent of one ``r?_k?_s??_e?_i?_o?_se?`` block string
    (reference: code/yolo3/efficientnet.py:143-188)."""

    num_repeat: int
    kernel_size: int
    strides: Tuple[int, int]
    expand_ratio: int
    input_filters: int
    output_filters: int
    se_ratio: Optional[float] = 0.25
    id_skip: bool = True


# The 7 stages of the base (B0) network
# (reference: code/yolo3/efficientnet.py:208-216).
BASE_BLOCKS = (
    BlockArgs(1, 3, (1, 1), 1, 32, 16),
    BlockArgs(2, 3, (2, 2), 6, 16, 24),
    BlockArgs(2, 5, (2, 2), 6, 24, 40),
    BlockArgs(3, 3, (2, 2), 6, 40, 80),
    BlockArgs(3, 5, (1, 1), 6, 80, 112),
    BlockArgs(4, 5, (2, 2), 6, 112, 192),
    BlockArgs(1, 3, (1, 1), 6, 192, 320),
)

# model -> (width_coefficient, depth_coefficient, resolution, dropout_rate)
# (reference: code/yolo3/efficientnet.py:361-372).
EFFICIENTNET_PARAMS = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

# Stage index (0-based) -> pyramid tap key; stage strides are
# [2,4,4,8,16,16,32,32] at stage ends, so these are /4, /8, /16, /32.
_TAP_STAGES = {1: "c2", 2: "c3", 4: "c4", 5: "c5"}


def round_filters(filters: int, width_coefficient: Optional[float], divisor: int = 8) -> int:
    """(reference: code/yolo3/efficientnet.py:364-380)."""
    if not width_coefficient:
        return filters
    filters *= width_coefficient
    new_filters = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new_filters < 0.9 * filters:
        new_filters += divisor
    return int(new_filters)


def round_repeats(repeats: int, depth_coefficient: Optional[float]) -> int:
    """(reference: code/yolo3/efficientnet.py:383-388)."""
    if not depth_coefficient:
        return repeats
    return int(math.ceil(depth_coefficient * repeats))


def decode_block_args(variant: str) -> Tuple[Tuple[BlockArgs, ...], float]:
    """Scale the base stage table for a B-variant; returns
    (per-stage args with rounded filters/repeats, dropout_rate)."""
    width, depth, _, dropout = EFFICIENTNET_PARAMS[variant]
    out = []
    for args in BASE_BLOCKS:
        out.append(
            dataclasses.replace(
                args,
                input_filters=round_filters(args.input_filters, width),
                output_filters=round_filters(args.output_filters, width),
                num_repeat=round_repeats(args.num_repeat, depth),
            )
        )
    return tuple(out), dropout


class EfficientNet(nn.Module):
    """Returns pyramid features {"c2", "c3", "c4", "c5"}
    (+ "top" when ``include_top_features``)."""

    variant: str = "b3"
    drop_connect_rate: float = 0.2
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    include_top_features: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        width, _, _, _ = EFFICIENTNET_PARAMS[self.variant]
        stages, _ = decode_block_args(self.variant)
        n_blocks = sum(s.num_repeat for s in stages)
        drop_dx = (self.drop_connect_rate or 0.0) / n_blocks

        x = ConvBN(
            round_filters(32, width), (3, 3), strides=(2, 2), act=swish,
            bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
            dtype=self.dtype, name="stem",
        )(x, train)

        feats: Dict[str, jnp.ndarray] = {}
        block_idx = 1  # 1-based, matching the reference's drop schedule.
        last_tap = max(_TAP_STAGES)
        for si, stage in enumerate(stages):
            if si > last_tap and not self.include_top_features:
                break
            for r in range(stage.num_repeat):
                x = MBConv(
                    input_filters=stage.input_filters if r == 0 else stage.output_filters,
                    output_filters=stage.output_filters,
                    kernel_size=stage.kernel_size,
                    strides=tuple(stage.strides) if r == 0 else (1, 1),
                    expand_ratio=stage.expand_ratio,
                    se_ratio=stage.se_ratio,
                    id_skip=stage.id_skip,
                    drop_connect_rate=drop_dx * block_idx,
                    bn_momentum=self.bn_momentum,
                    bn_epsilon=self.bn_epsilon,
                    dtype=self.dtype,
                    name=f"stage_{si}_block_{r}",
                )(x, train)
                block_idx += 1
            if si in _TAP_STAGES:
                feats[_TAP_STAGES[si]] = x

        if self.include_top_features:
            x = ConvBN(
                round_filters(1280, width), (1, 1), act=swish,
                bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
                dtype=self.dtype, name="top",
            )(x, train)
            feats["top"] = x
        return feats
