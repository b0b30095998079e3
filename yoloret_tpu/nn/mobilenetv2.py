"""MobileNetV2 backbone (width-multiplier alpha), NHWC Flax.

Re-designed from the Keras-applications network the reference wraps via its
BN-momentum override shim (reference: code/yolo3/override.py:88-341,
BN momentum 0.9 at override.py:207-227). The detector taps the four
stage-end features the reference reads by Keras layer name
(reference: code/yolo3/model.py:186-190):

  c2 = block_2_add   (stride 4,   make_divisible(24*alpha) ch)
  c3 = block_5_add   (stride 8,   make_divisible(32*alpha) ch)
  c4 = block_12_add  (stride 16,  make_divisible(96*alpha) ch)
  c5 = block_15_add  (stride 32,  make_divisible(160*alpha) ch)

block_16 and the final 1280-channel conv are dead weight for detection,
so they are only built when ``include_top_features=True`` (ImageNet
classification / weight-conversion parity).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.layers import (
    ConvBN,
    DepthwiseConvBN,
    make_divisible,
    relu6,
)

# (expansion t, base channels c, repeats n, first stride s) per stage,
# standard MobileNetV2; block numbering follows Keras (block_1..block_16).
_STAGES = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

# Keras block index of each detector tap and the pyramid key it feeds.
_TAP_BLOCKS = {2: "c2", 5: "c3", 12: "c4", 15: "c5"}


class InvertedResidual(nn.Module):
    """Expand 1x1 -> depthwise 3x3 -> project 1x1, residual when
    stride 1 and in == out channels."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    expand_ratio: int = 6
    bn_momentum: float = 0.9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        in_ch = x.shape[-1]
        if self.expand_ratio != 1:
            x = ConvBN(
                in_ch * self.expand_ratio, (1, 1), act=relu6,
                bn_momentum=self.bn_momentum, dtype=self.dtype, name="expand",
            )(x, train)
        x = DepthwiseConvBN(
            (3, 3), self.strides, act=relu6,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="depthwise",
        )(x, train)
        x = ConvBN(
            self.features, (1, 1), act=None,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="project",
        )(x, train)
        if self.strides == (1, 1) and in_ch == self.features:
            x = x + inputs
        return x


class MobileNetV2(nn.Module):
    """Returns a dict of pyramid features {"c2", "c3", "c4", "c5"}
    (+ "top" when ``include_top_features``)."""

    alpha: float = 0.75
    bn_momentum: float = 0.9
    include_top_features: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        stem_ch = make_divisible(32 * self.alpha, 8)
        x = ConvBN(
            stem_ch, (3, 3), strides=(2, 2), act=relu6,
            bn_momentum=self.bn_momentum, dtype=self.dtype, name="stem",
        )(x, train)

        feats: Dict[str, jnp.ndarray] = {}
        block_id = -1  # Keras's "expanded_conv" (no expand) is block 0.
        last_tap = max(_TAP_BLOCKS)
        for t, c, n, s in _STAGES:
            out_ch = make_divisible(c * self.alpha, 8)
            for i in range(n):
                block_id += 1
                if block_id > last_tap and not self.include_top_features:
                    break
                x = InvertedResidual(
                    out_ch,
                    strides=(s, s) if i == 0 else (1, 1),
                    expand_ratio=t,
                    bn_momentum=self.bn_momentum,
                    dtype=self.dtype,
                    name=f"block_{block_id}",
                )(x, train)
                if block_id in _TAP_BLOCKS:
                    feats[_TAP_BLOCKS[block_id]] = x

        if self.include_top_features:
            top_ch = make_divisible(1280 * self.alpha, 8) if self.alpha > 1.0 else 1280
            x = ConvBN(
                top_ch, (1, 1), act=relu6,
                bn_momentum=self.bn_momentum, dtype=self.dtype, name="top",
            )(x, train)
            feats["top"] = x
        return feats
