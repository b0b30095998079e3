"""Legacy model zoo — TPU-native equivalents of the reference's dormant
tf.compat.v1 bodies (reference: code/yolo3/model_computations.py; none
are reachable from the reference CLI, see SURVEY §2.2).

* ``YoloNano`` — the YOLO-Nano detector (EP/PEP/FCA modules,
  model_computations.py:597-719), a COMPLETE 3-scale body emitting the
  standard [B, gh, gw, A, 5+C] pyramid, so it plugs into this
  framework's full train/eval pipeline as ``backbone='yolo_nano'``.
* ``SkyNet`` — the DAC-SDC SkyNet single-scale body with the
  space-to-depth reorg bypass (model_computations.py:321-364). Kept as
  a standalone module: its single /8 output does not fit the 3-scale
  pipeline contract (the reference never integrated it either).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.layers import ConvBN, SeparableConvBN, relu6, upsample2x


class _SepConv(nn.Module):
    """3x3 depthwise + BN + ReLU6 then 1x1 pointwise + BN + ReLU6 with
    optional stride (the nano ``sepconv3x3``)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SeparableConvBN(
            self.features, (3, 3), strides=self.strides, dtype=self.dtype,
            name="sep",
        )(x, train)


class EP(nn.Module):
    """Expansion-projection block (model_computations.py:597-605)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = _SepConv(self.features, self.strides, dtype=self.dtype, name="conv")(x, train)
        if self.strides == (1, 1) and x.shape[-1] == self.features:
            return x + out
        return out


class PEP(nn.Module):
    """Projection-expansion-projection block
    (model_computations.py:607-616)."""

    features: int
    mid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBN(self.mid, (1, 1), act=relu6, dtype=self.dtype, name="proj")(x, train)
        out = _SepConv(self.features, dtype=self.dtype, name="conv")(out, train)
        if x.shape[-1] == self.features:
            return x + out
        return out


class FCA(nn.Module):
    """Fully-connected channel attention (model_computations.py:618-632)."""

    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2))
        s = nn.Dense(c // self.reduction, use_bias=False, dtype=self.dtype, name="reduce")(s)
        s = relu6(s)
        s = nn.Dense(c, use_bias=False, dtype=self.dtype, name="expand")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class YoloNano(nn.Module):
    """YOLO-Nano full detector body (model_computations.py:634-719):
    backbone taps at /8 (150ch), /16 (325ch), /32 (469ch), then a
    top-down neck with PEP/EP refinement and bias-free 1x1 heads."""

    num_classes: int = 20
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False, backbone_train=None):
        del backbone_train  # no transfer-learning split for nano
        x = images.astype(self.dtype)
        pred_ch = self.num_anchors * (5 + self.num_classes)
        cbr = lambda f, s, name: ConvBN(f, (3, 3), strides=(s, s), act=relu6,
                                        dtype=self.dtype, name=name)
        c1 = lambda f, name: ConvBN(f, (1, 1), act=relu6, dtype=self.dtype, name=name)

        x = cbr(12, 1, "stem_a")(x, train)
        x = cbr(24, 2, "stem_b")(x, train)
        x = PEP(24, 7, dtype=self.dtype, name="p1")(x, train)
        x = EP(70, (2, 2), dtype=self.dtype, name="e1")(x, train)
        x = PEP(70, 25, dtype=self.dtype, name="p2")(x, train)
        x = PEP(70, 24, dtype=self.dtype, name="p3")(x, train)
        x = EP(150, (2, 2), dtype=self.dtype, name="e2")(x, train)
        x = PEP(150, 56, dtype=self.dtype, name="p4")(x, train)
        x = c1(150, "c_mid")(x, train)
        x = FCA(8, dtype=self.dtype, name="fca")(x)
        x = PEP(150, 73, dtype=self.dtype, name="p5")(x, train)
        x = PEP(150, 71, dtype=self.dtype, name="p6")(x, train)
        out52 = PEP(150, 75, dtype=self.dtype, name="p7")(x, train)  # /8

        x = EP(325, (2, 2), dtype=self.dtype, name="e3")(out52, train)
        for i, mid in enumerate((132, 124, 141, 140, 137, 135, 133)):
            x = PEP(325, mid, dtype=self.dtype, name=f"p8_{i}")(x, train)
        out26 = PEP(325, 140, dtype=self.dtype, name="p9")(x, train)  # /16

        x = EP(545, (2, 2), dtype=self.dtype, name="e4")(out26, train)
        x = PEP(545, 276, dtype=self.dtype, name="p10")(x, train)
        x = c1(230, "c_down")(x, train)
        x = EP(489, dtype=self.dtype, name="e5")(x, train)
        out13 = PEP(469, 213, dtype=self.dtype, name="p11")(x, train)  # /32

        # neck (top-down)
        x1 = c1(189, "n13_a")(out13, train)
        x = c1(105, "n13_b")(x1, train)
        x = jnp.concatenate([upsample2x(x), out26], axis=-1)
        x = PEP(325, 113, dtype=self.dtype, name="n26_a")(x, train)
        x = PEP(207, 99, dtype=self.dtype, name="n26_b")(x, train)
        x2 = c1(98, "n26_c")(x, train)
        x = c1(47, "n26_d")(x2, train)
        x = jnp.concatenate([upsample2x(x), out52], axis=-1)
        x = PEP(122, 58, dtype=self.dtype, name="n52_a")(x, train)
        x = PEP(87, 52, dtype=self.dtype, name="n52_b")(x, train)
        x = PEP(93, 47, dtype=self.dtype, name="n52_c")(x, train)

        pred = lambda name: nn.Conv(pred_ch, (1, 1), use_bias=False,
                                    dtype=self.dtype, name=name)
        y3 = pred("head_52")(x)
        y2 = pred("head_26")(EP(183, dtype=self.dtype, name="n26_e")(x2, train))
        y1 = pred("head_13")(EP(462, dtype=self.dtype, name="n13_e")(x1, train))

        def split(y):
            b, gh, gw, _ = y.shape
            return y.reshape(b, gh, gw, self.num_anchors, 5 + self.num_classes).astype(jnp.float32)

        return split(y1), split(y2), split(y3)


def space_to_depth(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """SkyNet reorg layer (model_computations.py:321-336)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // stride, stride, w // stride, stride, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // stride, w // stride, stride * stride * c)


class SkyNet(nn.Module):
    """SkyNet single-scale body (model_computations.py:338-364): five
    separable-conv stages with a reorg bypass, one /8 prediction map."""

    num_classes: int = 20
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False):
        x = images.astype(self.dtype)
        sep = lambda f, name: SeparableConvBN(f, (3, 3), dtype=self.dtype, name=name)
        x = sep(48, "s1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = sep(96, "s2")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = sep(192, "s3")(x, train)
        short = space_to_depth(x)  # /8, 768 ch
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = sep(384, "s4")(x, train)
        x = sep(512, "s5")(x, train)
        x = jnp.concatenate([short, x], axis=-1)
        x = sep(96, "s6")(x, train)
        y = nn.Conv(
            self.num_anchors * (5 + self.num_classes), (1, 1), use_bias=False,
            dtype=self.dtype, name="head",
        )(x)
        b, gh, gw, _ = y.shape
        return y.reshape(b, gh, gw, self.num_anchors, 5 + self.num_classes).astype(jnp.float32)
