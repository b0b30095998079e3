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
from yoloret_tpu.ops.mbconv_pallas2 import (
    cp_block_args,
    from_cp,
    fused_mbconv2_cp,
    to_cp,
)


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


def _stock_block(x, we, be, wd, bd, wp, bp, *, stride, residual, dtype):
    """One inverted-residual block as stock XLA convs (BN pre-folded),
    compute in ``dtype`` like the stock Flax modules."""
    y = x
    if we is not None:
        y = relu6(jax.lax.conv_general_dilated(
            y, we[None, None].astype(dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + be[0].astype(dtype))
    ce = wd.shape[-1]
    y = jax.lax.conv_general_dilated(
        y, wd.astype(dtype).reshape(3, 3, 1, ce), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=ce,
    )
    y = relu6(y + bd[0].astype(dtype))
    y = jax.lax.conv_general_dilated(
        y, wp[None, None].astype(dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bp[0].astype(dtype)
    if residual:
        y = y + x
    return y


def _block_meta(variables, alpha, dtype):
    """[(name, stride, residual, cin, cout, args)] for blocks 0..last
    tap, BN folded."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    meta = []
    block_id = -1
    last_tap = max(_TAP_BLOCKS)
    stem_ch = make_divisible(32 * alpha, 8)
    in_ch = stem_ch
    for t, c, n, st in _STAGES:
        out_ch = make_divisible(c * alpha, 8)
        for i in range(n):
            block_id += 1
            if block_id > last_tap:
                return meta
            stride = st if i == 0 else 1
            residual = stride == 1 and in_ch == out_ch
            args = _block_args(
                p[f"block_{block_id}"], s[f"block_{block_id}"], dtype
            )
            meta.append((block_id, stride, residual, in_ch, out_ch, args))
            in_ch = out_ch
    return meta


def mobilenetv2_fused_features_v2(
    variables: Dict[str, Any],
    x: jnp.ndarray,
    alpha: float = 0.75,
    dtype: Any = jnp.bfloat16,
    interpret: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pyramid features via the v2 CP-layout kernel
    (ops/mbconv_pallas2.py): maximal runs of stride-1 blocks chain in
    the [B, C, HWp] layout with ONE to_cp/from_cp conversion per run
    (every detector tap falls at a run end); stride-2 blocks run as
    stock XLA convs in NHWC. Same math as ``mobilenetv2_fused_features``
    (v1) and the stock inference apply."""
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    x = x.astype(dtype)

    ks, bs_ = fold_bn(p["stem"]["conv"]["kernel"], p["stem"]["bn"],
                      s["stem"]["bn"])
    x = jax.lax.conv_general_dilated(
        x, ks.astype(dtype), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    x = relu6(x + bs_.astype(dtype))

    meta = _block_meta(variables, alpha, dtype)
    feats: Dict[str, jnp.ndarray] = {}
    i = 0
    while i < len(meta):
        _, stride, residual, _, out_ch, args = meta[i]
        if stride != 1:
            x = _stock_block(
                x, *args, stride=2, residual=False, dtype=dtype
            )
            if meta[i][0] in _TAP_BLOCKS:
                feats[_TAP_BLOCKS[meta[i][0]]] = x
            i += 1
            continue
        # maximal stride-1 run: one conversion round-trip, CP inside
        b, h, w, _ = x.shape
        y = to_cp(x)
        while i < len(meta) and meta[i][1] == 1:
            block_id, _, residual, _, out_ch, args = meta[i]
            y = fused_mbconv2_cp(
                y, *cp_block_args(*args, dtype=dtype), h=h, w=w,
                residual=residual, interpret=interpret,
            )
            if block_id in _TAP_BLOCKS:
                # taps only occur at run ends (asserted by the break)
                assert i + 1 == len(meta) or meta[i + 1][1] != 1
            i += 1
        x = from_cp(y, (b, h, w, out_ch))
        tap_id = meta[i - 1][0]
        if tap_id in _TAP_BLOCKS:
            feats[_TAP_BLOCKS[tap_id]] = x
    return feats


def fused_detector_apply(
    model: YoloReT,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    interpret: bool = False,
    version: int = 1,
):
    """Inference forward equal to ``model.apply(variables, images,
    False)`` but with the MobileNetV2 backbone on the fused Pallas path
    (``version=1``: per-block NHWC kernel; ``version=2``: CP-layout
    chained kernel). Only mobilenetv2* backbones are supported; others
    fall back to the stock apply."""
    kind = model.backbone
    if not kind.startswith("mobilenetv2"):
        return model.apply(variables, images, False)
    alpha = {"mobilenetv2x75": 0.75, "mobilenetv2x10": 1.0,
             "mobilenetv2x14": 1.4}[kind]
    x = images.astype(model.dtype)
    features = (mobilenetv2_fused_features if version == 1
                else mobilenetv2_fused_features_v2)
    feats = features(
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
