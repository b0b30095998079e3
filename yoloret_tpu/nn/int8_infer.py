"""W8A8 int8 inference path for the MobileNetV2 backbone.

The roofline study (docs/design.md) found every paper config
BANDWIDTH-bound at 57-72% of the v5e HBM roof, with the backbone's
expanded MBConv activations the dominant traffic — so the remaining
serving headroom is in BYTES, not FLOPs. This module stores every
tensor that crosses HBM between backbone convs as int8 (half of bf16),
computing convs on int8 operands with int32 accumulation (the MXU's
native int8 path) and folding the dequant->bias->relu6->requant chain
into the conv epilogue where XLA fuses it (no f32 intermediate is ever
materialized).

Quantization scheme (TFLite-flavored, simplified):
  * weights: symmetric per-output-channel int8, BatchNorm pre-folded
    (``fused_infer.fold_bn``);
  * activations: symmetric per-tensor int8, scales from an amax
    calibration pass over representative batches;
  * depthwise SAME padding is exact under the symmetric scheme (padded
    zeros == real zeros; no zero-point correction needed);
  * stem (3-channel input) and the RFCR/neck stay bf16 — their traffic
    is small; only the backbone conv chain is quantized;
  * taps c2/c3/c4/c5 dequantize to the model dtype for the neck.

The reference ships int8 only as a TFLite edge artifact
(code/yolo.py:386-394); serving int8 on the TPU itself is a
beyond-parity optimization. Accuracy cost is measured by
tools/int8_study.py (same harness as the TFLite path).
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from yoloret_tpu.nn.detector import YoloReT
from yoloret_tpu.nn.fused_infer import _block_meta, fold_bn
from yoloret_tpu.nn.layers import relu6
from yoloret_tpu.nn.mobilenetv2 import _TAP_BLOCKS

_DN = ("NHWC", "HWIO", "NHWC")
_ALPHAS = {"mobilenetv2x75": 0.75, "mobilenetv2x10": 1.0,
           "mobilenetv2x14": 1.4}


def _stem_folded(variables):
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    ks, bs = fold_bn(p["stem"]["conv"]["kernel"], p["stem"]["bn"],
                     s["stem"]["bn"])
    return ks, bs


def _stem_f32(variables, x):
    ks, bs = _stem_folded(variables)
    y = jax.lax.conv_general_dilated(
        x, ks, (2, 2), "SAME", dimension_numbers=_DN)
    return relu6(y + bs)


# --------------------------------------------------------------------------
# calibration


def calibrate_mobilenetv2(
    variables: Dict[str, Any],
    batches: Sequence[np.ndarray],
    alpha: float = 0.75,
) -> Dict[str, Any]:
    """Per-tensor activation amax scales from representative batches.

    ``batches``: iterable of [B,H,W,3] float arrays in [0,1] (the
    production normalization). Returns {"stem": s, "blocks": [{"e","d",
    "out"}...]} with scale = amax/127 (e/d are absent where the block
    has no expand / their amax, respectively).
    """
    meta = _block_meta(variables, alpha, jnp.float32)

    @jax.jit
    def amaxes(x):
        rec = []
        x = _stem_f32(variables, x)
        rec.append(jnp.max(jnp.abs(x)))
        for _, stride, residual, _, _, args in meta:
            we, be, wd, bd, wp, bp = args
            y = x
            blk = []
            if we is not None:
                y = relu6(jax.lax.conv_general_dilated(
                    y, we[None, None], (1, 1), "VALID",
                    dimension_numbers=_DN) + be[0])
                blk.append(jnp.max(jnp.abs(y)))
            ce = wd.shape[-1]
            y = jax.lax.conv_general_dilated(
                y, wd.reshape(3, 3, 1, ce), (stride, stride), "SAME",
                dimension_numbers=_DN, feature_group_count=ce)
            y = relu6(y + bd[0])
            blk.append(jnp.max(jnp.abs(y)))
            y = jax.lax.conv_general_dilated(
                y, wp[None, None], (1, 1), "VALID",
                dimension_numbers=_DN) + bp[0]
            if residual:
                y = y + x
            blk.append(jnp.max(jnp.abs(y)))
            rec.append(jnp.stack(blk))
            x = y
        return rec

    acc = None
    for b in batches:
        vals = [np.asarray(v) for v in amaxes(jnp.asarray(b, jnp.float32))]
        acc = vals if acc is None else [np.maximum(a, v)
                                        for a, v in zip(acc, vals)]
    out: Dict[str, Any] = {"stem": float(acc[0]) / 127.0, "blocks": []}
    for (_, _, _, _, _, args), blk in zip(meta, acc[1:]):
        blk = [float(v) / 127.0 for v in np.asarray(blk)]
        has_e = args[0] is not None
        rec = {"d": blk[-2], "out": blk[-1]}
        if has_e:
            rec["e"] = blk[0]
        out["blocks"].append(rec)
    return out


# --------------------------------------------------------------------------
# weight quantization


def _quant_w(w: jnp.ndarray, axis_last: bool = True):
    """Symmetric per-output-channel int8. w: [..., Cout]. Returns
    (w_q int8, w_s f32 [Cout])."""
    red = tuple(range(w.ndim - 1))
    ws = jnp.max(jnp.abs(w), axis=red)
    ws = jnp.maximum(ws, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(w / ws), -127, 127).astype(jnp.int8)
    return wq, ws.astype(jnp.float32)


def quantize_mobilenetv2(
    variables: Dict[str, Any],
    scales: Dict[str, Any],
    alpha: float = 0.75,
) -> Dict[str, Any]:
    """Build the int8 parameter tree from f32 variables + calibration
    scales. All dequant factors are pre-combined: one per-channel f32
    multiplier per conv (in_s * w_s) plus the folded-BN f32 bias."""
    meta = _block_meta(variables, alpha, jnp.float32)
    qp: Dict[str, Any] = {"stem": {}, "blocks": []}
    ks, bs = _stem_folded(variables)
    stem_s = scales["stem"]
    qp["stem"] = dict(kernel=ks, bias=bs, out_s=stem_s)
    in_s = stem_s
    for (bid, stride, residual, _, _, args), sc in zip(meta,
                                                       scales["blocks"]):
        we, be, wd, bd, wp, bp = args
        blk: Dict[str, Any] = dict(stride=stride, residual=residual,
                                   in_s=in_s, out_s=sc["out"])
        if we is not None:
            wq, ws = _quant_w(we)                      # [Cin,Ce]
            blk["we_q"] = wq[None, None]               # [1,1,Cin,Ce]
            blk["e_deq"] = in_s * ws
            blk["e_bias"] = be[0].astype(jnp.float32)
            blk["e_s"] = sc["e"]
            d_in_s = sc["e"]
        else:
            d_in_s = in_s
        ce = wd.shape[-1]
        wq, ws = _quant_w(wd.reshape(9, ce))           # per-channel of Ce
        blk["wd_q"] = wq.reshape(3, 3, 1, ce)
        blk["d_deq"] = d_in_s * ws
        blk["d_bias"] = bd[0].astype(jnp.float32)
        blk["d_s"] = sc["d"]
        wq, ws = _quant_w(wp)                          # [Ce,Cout]
        blk["wp_q"] = wq[None, None]
        blk["p_deq"] = sc["d"] * ws
        blk["p_bias"] = bp[0].astype(jnp.float32)
        qp["blocks"].append(blk)
        in_s = sc["out"]
    return qp


# --------------------------------------------------------------------------
# int8 forward


def _q(y: jnp.ndarray, s: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(y * (1.0 / s)), -127, 127).astype(jnp.int8)


def _conv_i8(x, w, strides=(1, 1), padding="VALID", fgc=1):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=_DN,
        feature_group_count=fgc, preferred_element_type=jnp.int32)


def _int8_block(xq: jnp.ndarray, blk: Dict[str, Any]) -> jnp.ndarray:
    y = xq
    if "we_q" in blk:
        e = _conv_i8(y, blk["we_q"])
        e = relu6(e.astype(jnp.float32) * blk["e_deq"] + blk["e_bias"])
        y = _q(e, blk["e_s"])
    ce = blk["wd_q"].shape[-1]
    st = blk["stride"]
    d = _conv_i8(y, blk["wd_q"], (st, st), "SAME", fgc=ce)
    d = relu6(d.astype(jnp.float32) * blk["d_deq"] + blk["d_bias"])
    y = _q(d, blk["d_s"])
    p = _conv_i8(y, blk["wp_q"])
    p = p.astype(jnp.float32) * blk["p_deq"] + blk["p_bias"]
    if blk["residual"]:
        p = p + xq.astype(jnp.float32) * blk["in_s"]
    return _q(p, blk["out_s"])


def mobilenetv2_int8_features(
    qp: Dict[str, Any],
    x: jnp.ndarray,
    dtype: Any = jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Pyramid features {c2..c5} (dequantized to ``dtype``) with the
    whole backbone conv chain crossing HBM as int8. ``x``: [B,H,W,3]
    float in [0,1]."""
    st = qp["stem"]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), st["kernel"].astype(dtype), (2, 2), "SAME",
        dimension_numbers=_DN)
    y = relu6(y.astype(jnp.float32) + st["bias"])
    xq = _q(y, st["out_s"])
    feats: Dict[str, jnp.ndarray] = {}
    for bid, blk in enumerate(qp["blocks"]):
        xq = _int8_block(xq, blk)
        if bid in _TAP_BLOCKS:
            feats[_TAP_BLOCKS[bid]] = (
                xq.astype(jnp.float32) * blk["out_s"]).astype(dtype)
    return feats


def int8_detector_apply(
    model: YoloReT,
    variables: Dict[str, Any],
    qp: Dict[str, Any],
    images: jnp.ndarray,
):
    """Inference forward matching ``model.apply(variables, images,
    False)`` with the MobileNetV2 backbone on the int8 path (RFCR +
    neck stay on the stock bf16 modules). ``images``: [B,H,W,3] float
    in [0,1]."""
    assert model.backbone in _ALPHAS, "int8 path supports mobilenetv2*"
    feats = mobilenetv2_int8_features(qp, images, dtype=model.dtype)

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


def quantize_from_data(
    model: YoloReT,
    variables: Dict[str, Any],
    sample_images: Sequence[np.ndarray],
    batch: int = 8,
) -> Dict[str, Any]:
    """Calibrate + quantize in one call. ``sample_images``: [N,H,W,3]
    floats in [0,1] (a few dozen representative images)."""
    alpha = _ALPHAS[model.backbone]
    arr = np.asarray(sample_images, np.float32)
    batches = [arr[i:i + batch] for i in range(0, len(arr), batch)]
    scales = calibrate_mobilenetv2(variables, batches, alpha=alpha)
    return quantize_mobilenetv2(variables, scales, alpha=alpha)
