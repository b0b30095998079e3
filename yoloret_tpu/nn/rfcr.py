"""RFCR — Raw Feature Collection and Redistribution, the paper's core
fusion module (reference: code/yolo3/model.py:146-168).

Collect: the three detection-scale taps plus one shallow tap (already
maxpool-downsampled x4 by the caller, reference model.py:190) are each
projected to 48 channels by a bias-free 1x1 conv (no BN/act), resampled
to the middle (/16) scale, and merged by a learned 4-way scalar
WeightedSum. The merged map goes through one 5x5 depthwise-separable
conv to 96 channels.

Redistribute: the fused 96-channel map is concatenated back onto each of
the three detection-scale inputs (downsampled for /32, as-is for /16,
upsampled for /8).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.layers import (
    SeparableConvBN,
    WeightedSum,
    conv_kernel_init,
    maxpool_downsample,
    upsample2x,
)


class RFCR(nn.Module):
    """``fusion='weighted_sum'`` is the paper's RFCR; ``'concat'`` is the
    proto-RFCR of the legacy scarf body (reference:
    code/yolo3/model_computations.py:229-319 concatenates collected taps
    instead of the learned WeightedSum)."""

    collect_channels: int = 48
    fuse_channels: int = 96
    fusion: str = "weighted_sum"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        b1: jnp.ndarray,  # /32 tap
        b2: jnp.ndarray,  # /16 tap
        b3: jnp.ndarray,  # /8 tap
        b4: jnp.ndarray,  # shallow tap, already at /16
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        def collect(x, name):
            return nn.Conv(
                self.collect_channels, (1, 1), use_bias=False,
                dtype=self.dtype, kernel_init=conv_kernel_init, name=name,
            )(x)

        b1c = collect(b1, "collect_1")
        b2c = collect(b2, "collect_2")
        b3c = collect(b3, "collect_3")
        b4c = collect(b4, "collect_4")

        collected = [upsample2x(b1c), b2c, maxpool_downsample(b3c), b4c]
        if self.fusion == "concat":
            bc = jnp.concatenate(collected, axis=-1)
        else:
            bc = WeightedSum(4, name="fuse_weights")(collected)
        bc = SeparableConvBN(
            self.fuse_channels, (5, 5), dtype=self.dtype, name="fuse_conv",
        )(bc, train)

        out1 = jnp.concatenate([b1, maxpool_downsample(bc)], axis=-1)
        out2 = jnp.concatenate([b2, bc], axis=-1)
        out3 = jnp.concatenate([b3, upsample2x(bc)], axis=-1)
        return out1, out2, out3
