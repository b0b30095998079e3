from yoloret_tpu.nn.layers import (
    ConvBN,
    DropConnect,
    MBConv,
    SeparableConvBN,
    SqueezeExcite,
    WeightedSum,
    make_divisible,
    relu6,
    swish,
)
from yoloret_tpu.nn.mobilenetv2 import MobileNetV2
from yoloret_tpu.nn.efficientnet import (
    EFFICIENTNET_PARAMS,
    BlockArgs,
    EfficientNet,
    decode_block_args,
    round_filters,
    round_repeats,
)
from yoloret_tpu.nn.rfcr import RFCR
from yoloret_tpu.nn.heads import DetectionNeck, LiteHeadBlock
from yoloret_tpu.nn.detector import BACKBONES, YoloReT, build_detector

__all__ = [
    "ConvBN",
    "DropConnect",
    "MBConv",
    "SeparableConvBN",
    "SqueezeExcite",
    "WeightedSum",
    "make_divisible",
    "relu6",
    "swish",
    "MobileNetV2",
    "EFFICIENTNET_PARAMS",
    "BlockArgs",
    "EfficientNet",
    "decode_block_args",
    "round_filters",
    "round_repeats",
    "RFCR",
    "DetectionNeck",
    "LiteHeadBlock",
    "BACKBONES",
    "YoloReT",
    "build_detector",
]
