"""Detection neck: EfficientNet-lite head blocks chained FPN (top-down)
then PANet (bottom-up), exactly the reference topology with
``panet = fpn = True`` hardcoded (reference: code/yolo3/model.py:228-323).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.layers import (
    ConvBN,
    MBConv,
    conv_kernel_init,
    maxpool_downsample,
    relu6,
    upsample2x,
)


class LiteHeadBlock(nn.Module):
    """``make_last_layers_efficientnet_lite``
    (reference: code/yolo3/model.py:91-115):

      x -> 1x1 ConvBN(filters, ReLU6) -> MBConv(expand 1, k3, SE 0.25,
      project to pred_channels) = trunk; pred = bias-free 1x1 conv on the
      trunk.

    The trunk therefore carries ``pred_channels`` channels into the rest
    of the neck — a reference quirk we preserve for weight parity. The
    pred conv is only materialized when ``with_pred`` (the reference
    builds it in the FPN pass too but never uses it, model.py:240-241).
    """

    filters: int            # block_args.input_filters * expand_ratio
    pred_channels: int      # num_anchors * (5 + num_classes)
    with_pred: bool = True
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        x = ConvBN(
            self.filters, (1, 1), act=relu6,
            bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
            dtype=self.dtype, name="expand",
        )(x, train)
        x = MBConv(
            input_filters=self.filters,
            output_filters=self.pred_channels,
            kernel_size=3,
            strides=(1, 1),
            expand_ratio=1,
            se_ratio=0.25,
            id_skip=True,  # no-op: in != out filters
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="mbconv",
        )(x, train)
        y = None
        if self.with_pred:
            y = nn.Conv(
                self.pred_channels, (1, 1), use_bias=False,
                dtype=self.dtype, kernel_init=conv_kernel_init, name="pred",
            )(x)
        return x, y


class DetectionNeck(nn.Module):
    """FPN + PANet over the three RFCR outputs; emits raw per-scale
    prediction maps [B, gh, gw, A*(5+C)] ordered coarsest (/32) first."""

    num_anchors: int = 3
    num_classes: int = 20
    bn_momentum: float = 0.99   # head blocks (EfficientNet global params)
    neck_bn_momentum: float = 0.9  # the block_20/24-style 1x1 stacks
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, b1: jnp.ndarray, b2: jnp.ndarray, b3: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        pred_ch = self.num_anchors * (5 + self.num_classes)

        def head(filters, name, with_pred):
            return LiteHeadBlock(
                filters, pred_ch, with_pred=with_pred,
                bn_momentum=self.bn_momentum, dtype=self.dtype, name=name,
            )

        def squeeze(filters, name):
            return ConvBN(
                filters, (1, 1), act=relu6,
                bn_momentum=self.neck_bn_momentum, dtype=self.dtype, name=name,
            )

        # --- FPN top-down pass (reference model.py:238-281) ---
        c1, _ = head(512, "fpn_head_32", with_pred=False)(b1, train)
        x = squeeze(256, "fpn_squeeze_32")(c1, train)
        x = jnp.concatenate([upsample2x(x), b2], axis=-1)
        c2, _ = head(256, "fpn_head_16", with_pred=False)(x, train)
        x = squeeze(128, "fpn_squeeze_16")(c2, train)
        x = jnp.concatenate([upsample2x(x), b3], axis=-1)
        c3, _ = head(128, "fpn_head_8", with_pred=False)(x, train)

        # --- PANet bottom-up pass (reference model.py:283-323) ---
        x, y3 = head(128, "pan_head_8", with_pred=True)(c3, train)
        x = squeeze(128, "pan_squeeze_8")(x, train)
        x = jnp.concatenate([maxpool_downsample(x), c2], axis=-1)
        x, y2 = head(256, "pan_head_16", with_pred=True)(x, train)
        x = squeeze(256, "pan_squeeze_16")(x, train)
        x = jnp.concatenate([maxpool_downsample(x), c1], axis=-1)
        _, y1 = head(512, "pan_head_32", with_pred=True)(x, train)

        return y1, y2, y3
