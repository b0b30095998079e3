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


def leaky(x: jnp.ndarray) -> jnp.ndarray:
    """LeakyReLU(0.1) — the darknet-family activation
    (reference: code/yolo3/darknet.py:23)."""
    return jax.nn.leaky_relu(x, 0.1)


class _FastestBlock(nn.Module):
    """Yolo-Fastest inverted bottleneck: expand 1x1 -> depthwise 3x3 ->
    project 1x1, each BN+LeakyReLU(0.1), residual at stride 1
    (reference: code/yolo3/darknet.py:54-73).

    The reference sketch wires the project conv to the block INPUT
    (darknet.py:66-69), silently discarding the expand/depthwise path —
    an obvious transcription bug in dormant code. This implements the
    intended dataflow (expand -> depthwise -> project, as in upstream
    Yolo-Fastest)."""

    features: int
    exp_features: int
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        x = ConvBN(self.exp_features, (1, 1), act=leaky, dtype=self.dtype,
                   name="expand")(x, train)
        from yoloret_tpu.nn.layers import DepthwiseConvBN

        x = DepthwiseConvBN((3, 3), self.strides, act=leaky,
                            dtype=self.dtype, name="depthwise")(x, train)
        x = ConvBN(self.features, (1, 1), act=leaky, dtype=self.dtype,
                   name="project")(x, train)
        if self.strides == (1, 1) and inputs.shape[-1] == self.features:
            x = x + inputs
        return x


class YoloFastest(nn.Module):
    """Yolo-Fastest full detector body — the reference's INTENDED
    comparison baseline (reference: code/yolo3/darknet.py:134-190; the
    sketch there is truncated with no return and a dead project path;
    see docs/parity.md). Emits the standard coarsest-first 3-scale
    pyramid so it plugs into the full pipeline as
    ``backbone='yolo_fastest'`` (``xl=True`` for yolo_fastest_xl,
    darknet.py:76-132).

    Stage plan (base / xl channels): stem conv + pw/dw/pw bottleneck,
    then 2/3/3/4+route2/4+route1/5 blocks with stride-2 transitions;
    heads: concat(route1, up(x)) through 1x1+5x5-dw refinement,
    a 5x5-dw tower on x, and a bare 1x1 on route2. The sketch's
    stride-2 STEM would land those heads at /16,/32,/64 — incompatible
    with the reference's own pipeline strides [32,16,8]
    (code/yolo3/model.py:596) — so the stem runs at stride 1 here and
    the taps land at the standard /8,/16,/32. Stem/head convs carry
    BN+LeakyReLU (the upstream Yolo-Fastest design; the reference
    sketch omits normalization there)."""

    num_classes: int = 20
    num_anchors: int = 3
    xl: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train: bool = False, backbone_train=None):
        del backbone_train  # no transfer-learning split for this body
        x = images.astype(self.dtype)
        pred_ch = self.num_anchors * (5 + self.num_classes)
        cb = lambda f, k, s, name: ConvBN(f, (k, k), strides=(s, s), act=leaky,
                                          dtype=self.dtype, name=name)
        blk = lambda f, e, s, name: _FastestBlock(f, e, (s, s),
                                                  dtype=self.dtype, name=name)
        from yoloret_tpu.nn.layers import DepthwiseConvBN

        dw5 = lambda name: DepthwiseConvBN((5, 5), act=leaky,
                                           dtype=self.dtype, name=name)

        if self.xl:  # darknet.py:76-111
            stem = (16, 16, 8)
            plan = [
                (8, 16, 1), (16, 48, 2),
                (16, 64, 1), (16, 64, 1), (16, 64, 2),
                (16, 96, 1), (16, 96, 1), (32, 96, 2),
                (32, 192, 1), (32, 192, 1), (32, 192, 1), (32, 192, 1),
                ("route2",), (48, 192, 2),
                (48, 272, 1), (48, 272, 1), (48, 272, 1), (48, 272, 1),
                ("route1",), (96, 272, 2),
                (96, 448, 1), (96, 448, 1), (96, 448, 1), (96, 448, 1),
                (96, 448, 1),
            ]
        else:  # darknet.py:135-169
            stem = (8, 8, 4)
            plan = [
                (4, 8, 1), (8, 24, 2),
                (8, 32, 1), (8, 32, 1), (8, 32, 2),
                (8, 48, 1), (8, 48, 1), (16, 48, 2),
                (16, 96, 1), (16, 96, 1), (16, 96, 1), (16, 96, 1),
                ("route2",), (24, 96, 2),
                (24, 136, 1), (24, 136, 1), (24, 136, 1), (24, 136, 1),
                ("route1",), (48, 136, 2),
                (48, 224, 1), (48, 224, 1), (48, 224, 1), (48, 224, 1),
                (48, 224, 1),
            ]

        x = cb(stem[0], 3, 1, "stem_conv")(x, train)
        x = cb(stem[1], 1, 1, "stem_pw")(x, train)
        x = DepthwiseConvBN((3, 3), act=leaky, dtype=self.dtype,
                            name="stem_dw")(x, train)
        x = cb(stem[2], 1, 1, "stem_proj")(x, train)

        routes = {}
        bi = 0
        for item in plan:
            if len(item) == 1:
                routes[item[0]] = x
                continue
            f, e, s = item
            x = blk(f, e, s, f"block_{bi}")(x, train)
            bi += 1

        x = cb(96, 1, 1, "bridge")(x, train)  # darknet.py:171

        # /16 branch (darknet.py:173-179)
        b1 = jnp.concatenate([routes["route1"], upsample2x(x)], axis=-1)
        b1 = cb(96, 1, 1, "h16_a")(b1, train)
        b1 = dw5("h16_dw1")(b1, train)
        b1 = cb(96, 1, 1, "h16_b")(b1, train)
        b1 = dw5("h16_dw2")(b1, train)
        b1 = cb(96, 1, 1, "h16_c")(b1, train)
        y2 = nn.Conv(pred_ch, (1, 1), dtype=self.dtype, name="head_16")(b1)

        # /32 branch (darknet.py:182-186)
        b2 = dw5("h32_dw1")(x, train)
        b2 = cb(128, 1, 1, "h32_a")(b2, train)
        b2 = dw5("h32_dw2")(b2, train)
        b2 = cb(128, 1, 1, "h32_b")(b2, train)
        y1 = nn.Conv(pred_ch, (1, 1), dtype=self.dtype, name="head_32")(b2)

        # /8 branch (darknet.py:190)
        y3 = nn.Conv(pred_ch, (1, 1), dtype=self.dtype, name="head_8")(
            routes["route2"]
        )

        def split(y):
            b, gh, gw, _ = y.shape
            return y.reshape(
                b, gh, gw, self.num_anchors, 5 + self.num_classes
            ).astype(jnp.float32)

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
