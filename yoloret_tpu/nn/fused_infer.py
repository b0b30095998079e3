"""Fused-backbone inference path: MobileNetV2 through the Pallas fused
MBConv kernel with BatchNorm folded into conv weights.

The training path keeps the stock Flax modules (XLA picks its own
fusions for the backward pass); this module rebuilds the IDENTICAL
forward math for inference from the same ``variables`` tree:

  * BN (inference mode, running stats) is an affine y = z*s + t with
    s = gamma/sqrt(var+eps), t = beta - mean*s — folded into each conv's
    kernel and a bias (``fold_bn``), removing the separate affine AND
    enabling the single-kernel fused block.
  * Each inverted-residual block runs as ONE Pallas kernel
    (ops/mbconv_pallas.py): the 6x-expanded tensor stays in VMEM
    instead of costing 2x its size in HBM traffic per block — the
    roofline study measured the stock conv stack bandwidth-bound at
    67% of HBM peak with ~40 MB/img of activation traffic.

RFCR + neck stay on stock XLA (their tensors are small; no conv-chain
traffic worth fusing). Equality with ``model.apply`` is pinned by
tests/test_fused_infer.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from yoloret_tpu.nn.detector import YoloReT
from yoloret_tpu.nn.layers import make_divisible, relu6
from yoloret_tpu.nn.mobilenetv2 import _STAGES, _TAP_BLOCKS
from yoloret_tpu.ops.mbconv_pallas import fused_mbconv


def fold_bn(kernel, bn_p, bn_s, eps=1e-3):
    """Fold inference-mode BatchNorm into (kernel, bias).

    kernel: [..., Cout]; bn_p: {scale, bias} params; bn_s: {mean, var}
    running stats. Returns (kernel * s, bias) with s, bias per-Cout.
    """
    s = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    t = bn_p["bias"] - bn_s["mean"] * s
    return kernel * s, t


def _block_args(p, s, dtype):
    """(we, be, wd, bd, wp, bp) for one InvertedResidual block, BN
    folded, in the fused kernel's layouts."""
    if "expand" in p:
        ke, be = fold_bn(p["expand"]["conv"]["kernel"],
                         p["expand"]["bn"], s["expand"]["bn"])
        we = ke[0, 0].astype(dtype)          # [1,1,Cin,Ce] -> [Cin,Ce]
        be = be[None].astype(jnp.float32)    # [1, Ce]
    else:
        we = be = None
    kd, bd = fold_bn(p["depthwise"]["dwconv"]["kernel"],
                     p["depthwise"]["bn"], s["depthwise"]["bn"])
    wd = kd[:, :, 0, :].astype(dtype)        # [3,3,1,Ce] -> [3,3,Ce]
    bd = bd[None].astype(jnp.float32)
    kp, bp = fold_bn(p["project"]["conv"]["kernel"],
                     p["project"]["bn"], s["project"]["bn"])
    wp = kp[0, 0].astype(dtype)
    bp = bp[None].astype(jnp.float32)
    return we, be, wd, bd, wp, bp


def mobilenetv2_fused_features(
    variables: Dict[str, Any],
    x: jnp.ndarray,
    alpha: float = 0.75,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pyramid features {c2, c3, c4, c5} — fused-kernel equivalent of
    ``MobileNetV2.__call__`` in inference mode."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    x = x.astype(dtype)

    # stem: plain conv with folded BN (one conv — nothing to fuse across)
    ks, bs_ = fold_bn(p["stem"]["conv"]["kernel"], p["stem"]["bn"],
                      s["stem"]["bn"])
    x = jax.lax.conv_general_dilated(
        x, ks.astype(dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = relu6(x + bs_.astype(dtype))

    feats: Dict[str, jnp.ndarray] = {}
    block_id = -1
    last_tap = max(_TAP_BLOCKS)
    for t, c, n, st in _STAGES:
        out_ch = make_divisible(c * alpha, 8)
        for i in range(n):
            block_id += 1
            if block_id > last_tap:
                break
            bp_ = p[f"block_{block_id}"]
            bs2 = s[f"block_{block_id}"]
            stride = st if i == 0 else 1
            in_ch = x.shape[-1]
            residual = stride == 1 and in_ch == out_ch
            we, be, wd, bd, wp, bpj = _block_args(bp_, bs2, dtype)
            x = fused_mbconv(
                x, we, be, wd, bd, wp, bpj,
                stride=stride, residual=residual, interpret=interpret,
            )
            if block_id in _TAP_BLOCKS:
                feats[_TAP_BLOCKS[block_id]] = x
    return feats


def fused_detector_apply(
    model: YoloReT,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    interpret: bool = False,
):
    """Inference forward equal to ``model.apply(variables, images,
    False)`` but with the MobileNetV2 backbone on the fused Pallas path.
    Only mobilenetv2* backbones are supported; others fall back to the
    stock apply."""
    kind = model.backbone
    if not kind.startswith("mobilenetv2"):
        return model.apply(variables, images, False)
    alpha = {"mobilenetv2x75": 0.75, "mobilenetv2x10": 1.0,
             "mobilenetv2x14": 1.4}[kind]
    x = images.astype(model.dtype)
    feats = mobilenetv2_fused_features(
        variables, x, alpha=alpha, dtype=model.dtype, interpret=interpret
    )

    def neck_part(m, feats):
        from yoloret_tpu.nn.layers import maxpool_downsample

        b4 = maxpool_downsample(feats["c2"], 4)
        b1, b2, b3 = m.rfcr(feats["c5"], feats["c4"], feats["c3"], b4, False)
        y1, y2, y3 = m.neck(b1, b2, b3, False)

        def split(y):
            b, gh, gw, _ = y.shape
            y = y.reshape(b, gh, gw, m.num_anchors, 5 + m.num_classes)
            return y.astype(jnp.float32)

        return split(y1), split(y2), split(y3)

    return model.apply(variables, feats, method=neck_part)
