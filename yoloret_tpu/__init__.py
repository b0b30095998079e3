"""yoloret_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

From-scratch rebuild of the capabilities of prakharg24/yoloret (YOLO-ReT,
WACV 2022): MobileNetV2(alpha) / EfficientNet-B0..B7 backbones, the RFCR
multi-scale fusion module, three-scale YOLOv3 heads, GIoU training loss with
two-stage truncated transfer learning, VOC/COCO data pipelines, VOC-style mAP
evaluation, k-means anchor generation, and batched on-device inference with
class-aware NMS — all designed TPU-first (fixed shapes, one jitted graph,
bf16 compute, pjit data parallelism over a device mesh).

Reference behavioral spec: /root/reference (see SURVEY.md). No code is
copied from the reference; file:line citations in docstrings point at the
behavior being matched.
"""

from yoloret_tpu.version import __version__

__all__ = ["__version__"]
