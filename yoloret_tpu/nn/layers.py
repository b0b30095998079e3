"""Shared Flax building blocks for the YOLO-ReT TPU rebuild.

These replace the reference's Keras layer compositions
(reference: code/yolo3/model.py:14-30, code/yolo3/efficientnet.py:327-536)
with NHWC Flax modules. Convolutions/BN run in a configurable compute dtype
(bf16 on TPU) with f32 parameters; BatchNorm statistics are always f32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def relu6(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.minimum(jnp.maximum(x, 0.0), 6.0)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (reference: code/yolo3/efficientnet.py:327-331)."""
    return x * jax.nn.sigmoid(x)


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding used by MobileNetV2 width multipliers
    (reference: code/yolo3/model.py:32-39)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """EfficientNet's fan-out-normal conv init
    (reference: code/yolo3/efficientnet.py:295-306). Shape is Flax HWIO."""
    kh, kw, _, out_ch = shape
    fan_out = int(kh * kw * out_ch)
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_out)


class ConvBN(nn.Module):
    """Conv2D(use_bias=False) + BatchNorm + optional activation.

    The reference builds this triple everywhere (e.g. the neck's
    block_20/24 stacks, code/yolo3/model.py:242-251).
    """

    features: int
    kernel_size: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[Callable] = relu6
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            feature_group_count=self.groups,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DepthwiseConvBN(nn.Module):
    """DepthwiseConv2D(use_bias=False) + BN + optional activation."""

    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    act: Optional[Callable] = relu6
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch = x.shape[-1]
        x = nn.Conv(
            ch,
            self.kernel_size,
            strides=self.strides,
            padding="SAME",
            use_bias=False,
            feature_group_count=ch,
            dtype=self.dtype,
            kernel_init=conv_kernel_init,
            name="dwconv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="bn",
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x


class SeparableConvBN(nn.Module):
    """Depthwise kxk + BN + ReLU6 then pointwise 1x1 + BN + ReLU6.

    Mirror of ``MobilenetSeparableConv2D`` (reference:
    code/yolo3/model.py:14-30) used by the RFCR fusion conv.
    """

    features: int
    kernel_size: Tuple[int, int] = (5, 5)
    strides: Tuple[int, int] = (1, 1)
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = DepthwiseConvBN(
            self.kernel_size,
            self.strides,
            act=relu6,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="depthwise",
        )(x, train)
        x = ConvBN(
            self.features,
            (1, 1),
            act=relu6,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
            name="pointwise",
        )(x, train)
        return x


class WeightedSum(nn.Module):
    """Learned scalar-weighted sum of N same-shape tensors — the RFCR
    fusion weights (reference: code/yolo3/model.py:117-137; init ones)."""

    num_inputs: int = 4

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
        assert len(xs) == self.num_inputs
        alpha = self.param("alpha", nn.initializers.ones, (self.num_inputs,), jnp.float32)
        alpha = alpha.astype(xs[0].dtype)
        out = alpha[0] * xs[0]
        for i in range(1, self.num_inputs):
            out = out + alpha[i] * xs[i]
        return out


class SqueezeExcite(nn.Module):
    """SE block: global mean -> reduce 1x1 (swish) -> excite 1x1 (sigmoid)
    -> scale (reference: code/yolo3/efficientnet.py:391-438).

    ``reduced`` is computed by the caller from the *block-args* input
    filters (not the runtime channel count), matching the reference.
    """

    reduced: int
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2), keepdims=True)
        s = nn.Conv(
            self.reduced, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=conv_kernel_init, name="reduce",
        )(s)
        s = swish(s)
        s = nn.Conv(
            self.features, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=conv_kernel_init, name="excite",
        )(s)
        s = jax.nn.sigmoid(s)
        return x * s


class DropConnect(nn.Module):
    """Per-sample stochastic depth (reference:
    code/yolo3/efficientnet.py:334-361). Identity when not training."""

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return (x / keep) * mask


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE — the EfficientNet block
    (reference: code/yolo3/efficientnet.py:467-536).

    expand 1x1 (skipped when expand_ratio == 1) -> depthwise kxk -> SE ->
    project 1x1; residual + DropConnect only when strides are 1 and
    input_filters == output_filters.
    """

    input_filters: int
    output_filters: int
    kernel_size: int = 3
    strides: Tuple[int, int] = (1, 1)
    expand_ratio: int = 6
    se_ratio: Optional[float] = 0.25
    id_skip: bool = True
    drop_connect_rate: float = 0.0
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    spatial_attention: bool = False  # MBConvBlockSpatial variant
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inputs = x
        filters = self.input_filters * self.expand_ratio
        if self.expand_ratio != 1:
            x = ConvBN(
                filters, (1, 1), act=swish,
                bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
                dtype=self.dtype, name="expand",
            )(x, train)
        x = DepthwiseConvBN(
            (self.kernel_size, self.kernel_size), self.strides, act=swish,
            bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
            dtype=self.dtype, name="depthwise",
        )(x, train)
        if self.spatial_attention:
            x = SpatialAttention(dtype=self.dtype, name="spatial")(x)
        elif self.se_ratio is not None and 0.0 < self.se_ratio <= 1.0:
            x = SqueezeExcite(
                reduced=max(1, int(self.input_filters * self.se_ratio)),
                features=filters,
                dtype=self.dtype,
                name="se",
            )(x)
        x = ConvBN(
            self.output_filters, (1, 1), act=None,
            bn_momentum=self.bn_momentum, bn_epsilon=self.bn_epsilon,
            dtype=self.dtype, name="project",
        )(x, train)
        if (
            self.id_skip
            and all(s == 1 for s in self.strides)
            and self.input_filters == self.output_filters
        ):
            if self.drop_connect_rate:
                x = DropConnect(self.drop_connect_rate, name="drop")(x, train)
            x = x + inputs
        return x


class SpatialAttention(nn.Module):
    """Spatial-attention gate — the reference's experimental
    ``SpatialBlock`` (code/yolo3/efficientnet.py:440-465, defined but off
    the main path): 1x1 conv to a single map, resize to <=20x20, two
    dense layers (swish then sigmoid), resize back, multiply.

    Available for the ``MBConv(spatial_attention=True)`` variant
    (``MBConvBlockSpatial``, efficientnet.py:538-609); the shipped
    detector configs do not use it, matching the reference.
    """

    pool_hw: int = 20
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        nh, nw = min(self.pool_hw, h), min(self.pool_hw, w)
        hidden = (nh * nh) // 4
        s = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, name="squeeze")(x)
        s = jax.image.resize(s, (b, nh, nw, 1), method="bilinear")
        s = s.reshape(b, nh * nw)
        s = nn.Dense(hidden, use_bias=True, dtype=self.dtype, name="reduce")(s)
        s = swish(s)
        s = nn.Dense(nh * nw, use_bias=True, dtype=self.dtype, name="expand")(s)
        s = jax.nn.sigmoid(s).reshape(b, nh, nw, 1)
        s = jax.image.resize(s, (b, h, w, 1), method="bilinear")
        return x * s


def maxpool_downsample(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """MaxPool downsample used throughout RFCR/PANet
    (reference: code/yolo3/model.py:139-144)."""
    return nn.max_pool(x, (stride, stride), strides=(stride, stride))


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (Keras UpSampling2D default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
