"""YOLO-ReT detector assembly: backbone taps -> RFCR -> FPN/PANet neck
-> per-scale [B, gh, gw, A, 5+C] raw outputs.

TPU-native equivalent of ``yolov3_body`` (reference:
code/yolo3/model.py:170-342). The whole forward is a single pure
function of (params, batchnorm state, images), jit/pjit-able with static
shapes; truncated transfer learning is handled outside the module as a
parameter-partition mask (see yoloret_tpu/train/freeze.py) instead of
Keras layer mutation (reference model.py:219-224).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from yoloret_tpu.nn.efficientnet import EfficientNet
from yoloret_tpu.nn.heads import DetectionNeck
from yoloret_tpu.nn.layers import maxpool_downsample
from yoloret_tpu.nn.mobilenetv2 import MobileNetV2
from yoloret_tpu.nn.rfcr import RFCR

# Backbone registry keyed by the reference's --model names
# (reference: code/yolo3/model.py:179-217), extended to all EfficientNet
# variants.
BACKBONES = {
    "mobilenetv2x75": ("mobilenetv2", dict(alpha=0.75)),
    "mobilenetv2x14": ("mobilenetv2", dict(alpha=1.4)),
    "mobilenetv2x10": ("mobilenetv2", dict(alpha=1.0)),
    "darknet53": ("darknet", dict()),
    # complete legacy bodies (no RFCR/neck): reference
    # model_computations.py (nano) and darknet.py:54-190 (fastest)
    "yolo_nano": ("fullbody", dict(cls="nano")),
    "yolo_fastest": ("fullbody", dict(cls="fastest")),
    "yolo_fastest_xl": ("fullbody", dict(cls="fastest", xl=True)),
    **{f"efficientnetb{i}": ("efficientnet", dict(variant=f"b{i}")) for i in range(8)},
}


class YoloReT(nn.Module):
    """Flagship detector. ``__call__(images, train)`` with images
    [B, H, W, 3] (H, W multiples of 32, RGB in [0, 1]) returns
    (y1, y2, y3): [B, H/32, W/32, A, 5+C], [B, H/16, ...], [B, H/8, ...].
    """

    backbone: str = "mobilenetv2x75"
    num_classes: int = 20
    num_anchors: int = 3
    remat: bool = False  # rematerialize backbone activations in the
    # backward pass (jax.checkpoint) — trades ~30% extra forward FLOPs
    # for O(taps) instead of O(depth) activation memory at large batch
    rfcr_fusion: str = "weighted_sum"  # the paper's RFCR ablation axis:
    # 'weighted_sum' (the contribution, reference model.py:117-168),
    # 'concat' (the legacy scarf proto-RFCR,
    # model_computations.py:229-319), 'none' (taps feed the neck
    # directly — the paper's no-RFCR baseline). Measured deltas:
    # tools/ablation.py, table in docs/design.md.
    dtype: Any = jnp.float32
    head_dtype: Any = jnp.float32  # storage dtype of the returned heads.
    # Default f32 preserves the "decode/loss math is f32" contract for
    # the training path. Inference paths pass ``head_dtype=None`` (keep
    # the compute dtype): every postprocess consumer casts f32 on
    # consumption, which is BITWISE what casting here produced — the
    # conv already rounded to bf16 — while skipping an [B, N, 5+C] f32
    # materialization (80 MB at b128@320) on the serving/MAP hot path
    # (round-5 byte diet; tests/test_postprocess_oracle.py locks the
    # bitwise claim).

    def setup(self):
        kind, kw = BACKBONES[self.backbone]
        self._fullbody = kind == "fullbody"
        wrap = (lambda cls: nn.remat(cls, static_argnums=(2,))) if self.remat else (lambda cls: cls)
        if kind == "mobilenetv2":
            self.body = wrap(MobileNetV2)(dtype=self.dtype, **kw)
        elif kind == "darknet":
            from yoloret_tpu.nn.darknet import DarkNet53

            self.body = wrap(DarkNet53)(dtype=self.dtype, **kw)
        elif kind == "fullbody":
            from yoloret_tpu.nn.legacy import YoloFastest, YoloNano

            body_kw = dict(kw)
            cls = {"nano": YoloNano, "fastest": YoloFastest}[body_kw.pop("cls")]
            self.body = cls(
                num_classes=self.num_classes,
                num_anchors=self.num_anchors,
                dtype=self.dtype,
                **body_kw,
            )
            return
        else:
            self.body = wrap(EfficientNet)(dtype=self.dtype, **kw)
        if self.rfcr_fusion != "none":
            self.rfcr = RFCR(fusion=self.rfcr_fusion, dtype=self.dtype)
        self.neck = DetectionNeck(
            num_anchors=self.num_anchors,
            num_classes=self.num_classes,
            dtype=self.dtype,
        )

    def __call__(
        self,
        images: jnp.ndarray,
        train: bool = False,
        backbone_train: bool | None = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``backbone_train=False`` while ``train=True`` reproduces stage-1
        truncated-transfer semantics: frozen backbone BatchNorms run on
        moving statistics and do not update them (Keras trainable=False
        BN behavior, reference: code/yolo3/model.py:219-224), while the
        RFCR/neck BNs keep training."""
        h, w = images.shape[-3], images.shape[-2]
        if h % 32 or w % 32:
            raise ValueError(
                f"input spatial size ({h}, {w}) must be a multiple of 32 "
                "(three stride-2 stages feed the /8,/16,/32 pyramid)"
            )
        if backbone_train is None:
            backbone_train = train
        if self._fullbody:
            return self.body(images, train)
        x = images.astype(self.dtype)
        feats = self.body(x, backbone_train)
        if self.rfcr_fusion != "none":
            # Shallow tap is pooled x4 to the /16 scale before collection
            # (reference: code/yolo3/model.py:190).
            b4 = maxpool_downsample(feats["c2"], 4)
            b1, b2, b3 = self.rfcr(
                feats["c5"], feats["c4"], feats["c3"], b4, train
            )
        else:
            b1, b2, b3 = feats["c5"], feats["c4"], feats["c3"]
        y1, y2, y3 = self.neck(b1, b2, b3, train)

        def split(y):
            b, gh, gw, _ = y.shape
            y = y.reshape(b, gh, gw, self.num_anchors, 5 + self.num_classes)
            # Decode/loss math runs in f32 regardless of compute dtype;
            # head_dtype=None keeps the compute dtype and defers the f32
            # cast to the consumer (bitwise-equal, see class docstring).
            return y if self.head_dtype is None else y.astype(self.head_dtype)

        return split(y1), split(y2), split(y3)


def build_detector(
    backbone: str = "mobilenetv2x75",
    num_classes: int = 20,
    num_anchors: int = 3,
    dtype: Any = jnp.float32,
    remat: bool = False,
    rfcr: str = "weighted_sum",
    head_dtype: Any = jnp.float32,
) -> YoloReT:
    """``head_dtype=None`` keeps the heads in the compute dtype (the
    inference-path byte diet, see YoloReT.head_dtype); the f32 default
    is the training/loss contract."""
    if backbone not in BACKBONES:
        raise ValueError(f"unknown backbone {backbone!r}; options: {sorted(BACKBONES)}")
    if rfcr not in ("weighted_sum", "concat", "none"):
        raise ValueError(
            f"unknown rfcr fusion {rfcr!r}; options: weighted_sum, concat, none"
        )
    return YoloReT(
        backbone=backbone,
        num_classes=num_classes,
        num_anchors=num_anchors,
        remat=remat,
        rfcr_fusion=rfcr,
        dtype=dtype,
        head_dtype=head_dtype,
    )
