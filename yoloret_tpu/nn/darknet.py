"""DarkNet-53 backbone — the YOLOv3 comparison baseline the reference
keeps alongside the edge backbones (reference: code/yolo3/darknet.py:
38-52; conv/BN/LeakyReLU building blocks :13-36).

Standard structure: 3x3/32 stem, five downsample stages (stride-2 conv)
with [1, 2, 8, 8, 4] residual blocks of [64, 128, 256, 512, 1024]
filters; residual = 1x1 half-filters -> 3x3 filters + skip; activation
LeakyReLU(0.1). Detector taps are the stage outputs at /4, /8, /16, /32
matching the pyramid contract of nn/mobilenetv2.py.

(The reference also sketches Yolo-Fastest bodies at darknet.py:54-190,
but that code is truncated — no return statement — and unused; it is
deliberately omitted here, see docs/parity.md.)
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.layers import ConvBN

leaky = partial(jax.nn.leaky_relu, negative_slope=0.1)

_STAGES = ((1, 64), (2, 128), (8, 256), (8, 512), (4, 1024))
_TAPS = {1: "c2", 2: "c3", 3: "c4", 4: "c5"}  # stage idx -> pyramid key


class DarkResidual(nn.Module):
    filters: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.filters // 2, (1, 1), act=leaky, bn_momentum=0.99,
                   dtype=self.dtype, name="reduce")(x, train)
        y = ConvBN(self.filters, (3, 3), act=leaky, bn_momentum=0.99,
                   dtype=self.dtype, name="expand")(y, train)
        return x + y


class DarkNet53(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = ConvBN(32, (3, 3), act=leaky, bn_momentum=0.99,
                   dtype=self.dtype, name="stem")(x, train)
        feats: Dict[str, jnp.ndarray] = {}
        for si, (repeats, filters) in enumerate(_STAGES):
            x = ConvBN(filters, (3, 3), strides=(2, 2), act=leaky,
                       bn_momentum=0.99, dtype=self.dtype,
                       name=f"down_{si}")(x, train)
            for r in range(repeats):
                x = DarkResidual(filters, dtype=self.dtype,
                                 name=f"stage_{si}_block_{r}")(x, train)
            if si in _TAPS:
                feats[_TAPS[si]] = x
        return feats
