"""W8A8 int8 inference path for the MobileNetV2 and EfficientNet
backbones.

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
  * EfficientNet's SE blocks run in f32 on the pooled vector (tiny);
    the expanded tensor they scale is read/written as int8;
  * taps c2/c3/c4/c5 dequantize to the model dtype for the neck.

The reference ships int8 only as a TFLite edge artifact
(code/yolo.py:386-394); serving int8 on the TPU itself is a
beyond-parity optimization. Accuracy cost is measured by
tools/int8_study.py (same harness as the TFLite path).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

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


def _quant_w(w: jnp.ndarray):
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


def _act(y: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu6":
        return relu6(y)
    if kind == "swish":
        return y * jax.nn.sigmoid(y)
    raise ValueError(kind)


def _requant_folded(acc: jnp.ndarray, deq: jnp.ndarray, bias: jnp.ndarray,
                    out_s: float, act: Optional[str],
                    extra: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scale-folded requant epilogue: compute directly in OUTPUT-scale
    units so the separate ``* (1/out_s)`` full-tensor multiply of the
    legacy chain disappears (one fewer VPU op per element on the
    expanded tensors — the round-3 roofline blamed the epilogues for
    int8 reaching only 70% of its own HBM roof, docs/design.md).

    relu6 commutes with positive rescaling as clip(x/s, 0, 6/s); swish
    does not, so EfficientNet keeps the legacy chain. ``extra`` is a
    pre-scaled residual term added before rounding."""
    inv = 1.0 / out_s
    y = acc.astype(jnp.float32) * (deq * inv) + bias * inv
    if extra is not None:
        y = y + extra
    if act == "relu6":
        y = jnp.clip(y, 0.0, 6.0 * inv)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _int8_block(xq: jnp.ndarray, blk: Dict[str, Any],
                folded: bool = False) -> jnp.ndarray:
    """One quantized MBConv / inverted-residual block. Every tensor
    between convs is int8; dequant -> act -> (SE scale) -> requant
    chains are f32 elementwise that XLA fuses into the conv epilogues.
    ``folded=True`` switches the relu6/linear epilogues to the
    scale-folded form (see ``_requant_folded``; same math, one fewer
    multiply). ``blk`` schema: see ``quantize_mobilenetv2`` /
    ``quantize_efficientnet``."""
    act = blk.get("act", "relu6")
    use_fold = folded and act == "relu6" and "se_reduce_w" not in blk
    y = xq
    if "we_q" in blk:
        e = _conv_i8(y, blk["we_q"])
        if use_fold:
            y = _requant_folded(e, blk["e_deq"], blk["e_bias"],
                                blk["e_s"], act)
        else:
            e = _act(e.astype(jnp.float32) * blk["e_deq"] + blk["e_bias"],
                     act)
            y = _q(e, blk["e_s"])
    ce = blk["wd_q"].shape[-1]
    st = blk["stride"]
    d = _conv_i8(y, blk["wd_q"], (st, st), "SAME", fgc=ce)
    if use_fold:
        d_q = _requant_folded(d, blk["d_deq"], blk["d_bias"],
                              blk["d_s"], act)
        p = _conv_i8(d_q, blk["wp_q"])
        extra = None
        if blk["residual"]:
            extra = xq.astype(jnp.float32) * (blk["in_s"] / blk["out_s"])
        return _requant_folded(p, blk["p_deq"], blk["p_bias"],
                               blk["out_s"], None, extra=extra)
    d = _act(d.astype(jnp.float32) * blk["d_deq"] + blk["d_bias"], act)
    y = _q(d, blk["d_s"])
    if "se_reduce_w" in blk:
        # SE in f32 on the pooled vector (tiny); the big expanded tensor
        # is read back as int8 for both the mean and the scale-multiply
        m = jnp.mean(y.astype(jnp.float32), axis=(1, 2),
                     keepdims=True) * blk["d_s"]
        s = _act(
            jax.lax.conv_general_dilated(
                m, blk["se_reduce_w"], (1, 1), "VALID",
                dimension_numbers=_DN) + blk["se_reduce_b"], "swish")
        s = jax.nn.sigmoid(
            jax.lax.conv_general_dilated(
                s, blk["se_excite_w"], (1, 1), "VALID",
                dimension_numbers=_DN) + blk["se_excite_b"])
        y = _q(y.astype(jnp.float32) * (blk["d_s"] * s), blk["p_in_s"])
    p = _conv_i8(y, blk["wp_q"])
    p = p.astype(jnp.float32) * blk["p_deq"] + blk["p_bias"]
    if blk["residual"]:
        p = p + xq.astype(jnp.float32) * blk["in_s"]
    return _q(p, blk["out_s"])


# --------------------------------------------------------------------------
# EfficientNet family (swish activations, SE blocks, kxk depthwise)


def _effnet_meta(variables, variant: str):
    """[(name, stride, residual, k, tap_key_or_None, folded args, se
    params)] for stages 0..last tap, BN folded (f32)."""
    from yoloret_tpu.nn.efficientnet import _TAP_STAGES, decode_block_args

    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    stages, _ = decode_block_args(variant)
    last_tap = max(_TAP_STAGES)
    meta = []
    for si, stage in enumerate(stages):
        if si > last_tap:
            break
        for r in range(stage.num_repeat):
            name = f"stage_{si}_block_{r}"
            strides = tuple(stage.strides) if r == 0 else (1, 1)
            in_f = stage.input_filters if r == 0 else stage.output_filters
            residual = (stage.id_skip and strides == (1, 1)
                        and in_f == stage.output_filters)
            bp, bs = p[name], s[name]
            if "expand" in bp:
                ke, be = fold_bn(bp["expand"]["conv"]["kernel"],
                                 bp["expand"]["bn"], bs["expand"]["bn"])
            else:
                ke = be = None
            kd, bd = fold_bn(bp["depthwise"]["dwconv"]["kernel"],
                             bp["depthwise"]["bn"], bs["depthwise"]["bn"])
            kp, bpj = fold_bn(bp["project"]["conv"]["kernel"],
                              bp["project"]["bn"], bs["project"]["bn"])
            se = None
            if "se" in bp:
                se = dict(
                    reduce_w=bp["se"]["reduce"]["kernel"],
                    reduce_b=bp["se"]["reduce"]["bias"],
                    excite_w=bp["se"]["excite"]["kernel"],
                    excite_b=bp["se"]["excite"]["bias"],
                )
            tap = _TAP_STAGES.get(si) if r == stage.num_repeat - 1 else None
            meta.append((name, strides[0], residual, stage.kernel_size,
                         tap, (ke, be, kd, bd, kp, bpj), se))
    return meta


def _effnet_stem_f32(variables, x):
    from yoloret_tpu.nn.layers import swish

    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    ks, bs = fold_bn(p["stem"]["conv"]["kernel"], p["stem"]["bn"],
                     s["stem"]["bn"])
    y = jax.lax.conv_general_dilated(
        x, ks, (2, 2), "SAME", dimension_numbers=_DN)
    return swish(y + bs)


def _effnet_block_f32(x, m):
    """f32 oracle forward of one block from its meta entry, returning
    the calibration intermediates (e, d, p_in, out)."""
    from yoloret_tpu.nn.layers import swish

    _, stride, residual, k, _, (ke, be, kd, bd, kp, bpj), se = m
    y = x
    e = None
    if ke is not None:
        e = swish(jax.lax.conv_general_dilated(
            y, ke, (1, 1), "SAME", dimension_numbers=_DN) + be)
        y = e
    ce = kd.shape[-1]
    d = swish(jax.lax.conv_general_dilated(
        y, kd, (stride, stride), "SAME", dimension_numbers=_DN,
        feature_group_count=ce) + bd)
    y = d
    if se is not None:
        mpool = jnp.mean(y, axis=(1, 2), keepdims=True)
        t = swish(jax.lax.conv_general_dilated(
            mpool, se["reduce_w"], (1, 1), "VALID",
            dimension_numbers=_DN) + se["reduce_b"])
        t = jax.nn.sigmoid(jax.lax.conv_general_dilated(
            t, se["excite_w"], (1, 1), "VALID",
            dimension_numbers=_DN) + se["excite_b"])
        y = y * t
    p_in = y
    out = jax.lax.conv_general_dilated(
        y, kp, (1, 1), "SAME", dimension_numbers=_DN) + bpj
    if residual:
        out = out + x
    return e, d, p_in, out


def calibrate_efficientnet(
    variables: Dict[str, Any],
    batches: Sequence[np.ndarray],
    variant: str = "b3",
) -> Dict[str, Any]:
    """Per-tensor activation amax scales (see
    ``calibrate_mobilenetv2``); blocks additionally get ``p_in`` (the
    post-SE project input)."""
    meta = _effnet_meta(variables, variant)

    @jax.jit
    def amaxes(x):
        rec = []
        x = _effnet_stem_f32(variables, x)
        rec.append(jnp.max(jnp.abs(x)))
        for m in meta:
            e, d, p_in, out = _effnet_block_f32(x, m)
            vals = [jnp.max(jnp.abs(d)), jnp.max(jnp.abs(p_in)),
                    jnp.max(jnp.abs(out))]
            if e is not None:
                vals.insert(0, jnp.max(jnp.abs(e)))
            rec.append(jnp.stack(vals))
            x = out
        return rec

    acc = None
    for b in batches:
        vals = [np.asarray(v) for v in amaxes(jnp.asarray(b, jnp.float32))]
        acc = vals if acc is None else [np.maximum(a, v)
                                        for a, v in zip(acc, vals)]
    out: Dict[str, Any] = {"stem": float(acc[0]) / 127.0, "blocks": []}
    for m, blk in zip(meta, acc[1:]):
        has_e = m[5][0] is not None
        blk = [float(v) / 127.0 for v in np.asarray(blk)]
        rec = {"d": blk[-3], "p_in": blk[-2], "out": blk[-1]}
        if has_e:
            rec["e"] = blk[0]
        out["blocks"].append(rec)
    return out


def quantize_efficientnet(
    variables: Dict[str, Any],
    scales: Dict[str, Any],
    variant: str = "b3",
) -> Dict[str, Any]:
    """Int8 parameter tree for the EfficientNet backbone (swish + SE;
    same schema as ``quantize_mobilenetv2`` plus ``act``/SE fields)."""
    meta = _effnet_meta(variables, variant)
    p = variables["params"]["body"]
    s = variables["batch_stats"]["body"]
    ks, bs = fold_bn(p["stem"]["conv"]["kernel"], p["stem"]["bn"],
                     s["stem"]["bn"])
    qp: Dict[str, Any] = {
        "stem": dict(kernel=ks, bias=bs, out_s=scales["stem"], act="swish"),
        "blocks": [], "taps": {},
    }
    in_s = scales["stem"]
    for bi, (m, sc) in enumerate(zip(meta, scales["blocks"])):
        name, stride, residual, k, tap, (ke, be, kd, bd, kp, bpj), se = m
        blk: Dict[str, Any] = dict(stride=stride, residual=residual,
                                   in_s=in_s, out_s=sc["out"], act="swish")
        if ke is not None:
            wq, ws = _quant_w(ke[0, 0])
            blk["we_q"] = wq[None, None]
            blk["e_deq"] = in_s * ws
            blk["e_bias"] = be.astype(jnp.float32)
            blk["e_s"] = sc["e"]
            d_in_s = sc["e"]
        else:
            d_in_s = in_s
        ce = kd.shape[-1]
        wq, ws = _quant_w(kd.reshape(k * k, ce))
        blk["wd_q"] = wq.reshape(k, k, 1, ce)
        blk["d_deq"] = d_in_s * ws
        blk["d_bias"] = bd.astype(jnp.float32)
        blk["d_s"] = sc["d"]
        p_in_s = sc["d"]
        if se is not None:
            blk["se_reduce_w"] = se["reduce_w"]
            blk["se_reduce_b"] = se["reduce_b"]
            blk["se_excite_w"] = se["excite_w"]
            blk["se_excite_b"] = se["excite_b"]
            blk["p_in_s"] = sc["p_in"]
            p_in_s = sc["p_in"]
        wq, ws = _quant_w(kp[0, 0])
        blk["wp_q"] = wq[None, None]
        blk["p_deq"] = p_in_s * ws
        blk["p_bias"] = bpj.astype(jnp.float32)
        qp["blocks"].append(blk)
        if tap:
            qp["taps"][bi] = tap
        in_s = sc["out"]
    return qp


def efficientnet_int8_features(
    qp: Dict[str, Any],
    x: jnp.ndarray,
    dtype: Any = jnp.bfloat16,
) -> Dict[str, jnp.ndarray]:
    """Pyramid features {c2..c5} with the EfficientNet backbone conv
    chain crossing HBM as int8 (SE pools/scales in fused f32)."""
    st = qp["stem"]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), st["kernel"].astype(dtype), (2, 2), "SAME",
        dimension_numbers=_DN)
    y = _act(y.astype(jnp.float32) + st["bias"], "swish")
    xq = _q(y, st["out_s"])
    feats: Dict[str, jnp.ndarray] = {}
    for bi, blk in enumerate(qp["blocks"]):
        xq = _int8_block(xq, blk)
        if bi in qp["taps"]:
            feats[qp["taps"][bi]] = (
                xq.astype(jnp.float32) * blk["out_s"]).astype(dtype)
    return feats


def mobilenetv2_int8_features(
    qp: Dict[str, Any],
    x: jnp.ndarray,
    dtype: Any = jnp.bfloat16,
    folded: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Pyramid features {c2..c5} (dequantized to ``dtype``) with the
    whole backbone conv chain crossing HBM as int8. ``x``: [B,H,W,3]
    float in [0,1]. ``folded``: scale-folded requant epilogues
    (``_requant_folded``)."""
    st = qp["stem"]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), st["kernel"].astype(dtype), (2, 2), "SAME",
        dimension_numbers=_DN)
    y = relu6(y.astype(jnp.float32) + st["bias"])
    xq = _q(y, st["out_s"])
    feats: Dict[str, jnp.ndarray] = {}
    for bid, blk in enumerate(qp["blocks"]):
        xq = _int8_block(xq, blk, folded=folded)
        if bid in _TAP_BLOCKS:
            feats[_TAP_BLOCKS[bid]] = (
                xq.astype(jnp.float32) * blk["out_s"]).astype(dtype)
    return feats


def int8_detector_apply(
    model: YoloReT,
    variables: Dict[str, Any],
    qp: Dict[str, Any],
    images: jnp.ndarray,
    folded: bool = True,
):
    """Inference forward matching ``model.apply(variables, images,
    False)`` with the backbone on the int8 path (RFCR + neck stay on
    the stock bf16 modules). ``images``: [B,H,W,3] float in [0,1].
    ``folded`` (default on) uses the scale-folded requant epilogues —
    numerically equivalent to the legacy dequant→act→requant chain up
    to 1-LSB requant rounding (the f32 dequant math is reassociated,
    which can flip values at round() boundaries; the equivalence test
    bounds the differing fraction) and measured +3.3% pipeline
    throughput (docs/design.md int8 table); only relu6/linear blocks
    fold, swish/SE blocks fall back automatically."""
    if model.backbone in _ALPHAS:
        feats = mobilenetv2_int8_features(qp, images, dtype=model.dtype,
                                          folded=folded)
    elif model.backbone.startswith("efficientnetb"):
        feats = efficientnet_int8_features(qp, images, dtype=model.dtype)
    else:
        raise AssertionError(
            "int8 path supports mobilenetv2* / efficientnetb*")

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
    arr = np.asarray(sample_images, np.float32)
    batches = [arr[i:i + batch] for i in range(0, len(arr), batch)]
    if model.backbone in _ALPHAS:
        alpha = _ALPHAS[model.backbone]
        scales = calibrate_mobilenetv2(variables, batches, alpha=alpha)
        return quantize_mobilenetv2(variables, scales, alpha=alpha)
    if model.backbone.startswith("efficientnetb"):
        variant = model.backbone[len("efficientnet"):]
        scales = calibrate_efficientnet(variables, batches, variant=variant)
        return quantize_efficientnet(variables, scales, variant=variant)
    raise AssertionError("int8 path supports mobilenetv2* / efficientnetb*")
