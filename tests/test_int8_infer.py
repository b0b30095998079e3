"""W8A8 int8 backbone path: calibrate -> quantize -> forward must stay
close to the f32 forward, and the int8 detector must find the same
objects as the stock detector on peaked weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yoloret_tpu.nn import build_detector
from yoloret_tpu.nn.int8_infer import (
    calibrate_mobilenetv2,
    int8_detector_apply,
    mobilenetv2_int8_features,
    quantize_from_data,
    quantize_mobilenetv2,
)


def _variables(model, seed=0, size=96):
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(seed), x, False)
    stats = jax.tree.map(
        lambda t: t + 0.05 * np.random.RandomState(1).rand(*t.shape).astype(t.dtype)
        if t.ndim else t,
        v["batch_stats"],
    )
    return {"params": v["params"], "batch_stats": stats}


def test_int8_features_close_to_f32():
    model = build_detector("mobilenetv2x75", num_classes=3)
    variables = _variables(model)
    rng = np.random.RandomState(0)
    calib = rng.rand(8, 96, 96, 3).astype(np.float32)
    x = jnp.asarray(rng.rand(2, 96, 96, 3).astype(np.float32))

    scales = calibrate_mobilenetv2(variables, [calib], alpha=0.75)
    assert scales["stem"] > 0 and len(scales["blocks"]) == 16
    qp = quantize_mobilenetv2(variables, scales, alpha=0.75)
    got = mobilenetv2_int8_features(qp, x, dtype=jnp.float32)

    want = model.apply(
        variables, x,
        method=lambda m, xx: m.body(xx.astype(jnp.float32), False))
    assert set(got) == {"c2", "c3", "c4", "c5"}
    for k in ("c2", "c3", "c4", "c5"):
        g, w = np.asarray(got[k], np.float32), np.asarray(want[k], np.float32)
        rel = np.sqrt(np.mean((g - w) ** 2)) / (np.sqrt(np.mean(w ** 2)) + 1e-8)
        # 16 blocks of symmetric per-tensor int8 accumulate a few % of
        # relative RMS error; correlation must stay essentially perfect
        corr = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert rel < 0.15, (k, rel)
        assert corr > 0.98, (k, corr)


def test_int8_tensors_actually_cross_as_int8():
    """The compiled program must carry int8 between backbone convs —
    this is the entire point (bytes, not flops)."""
    model = build_detector("mobilenetv2x75", num_classes=2)
    variables = _variables(model, size=64)
    rng = np.random.RandomState(0)
    qp = quantize_from_data(
        model, variables, rng.rand(4, 64, 64, 3).astype(np.float32))
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    jaxpr = jax.make_jaxpr(
        lambda xx: mobilenetv2_int8_features(qp, xx))(x)
    convs = [e for e in jaxpr.jaxpr.eqns
             if e.primitive.name == "conv_general_dilated"]
    i8 = [e for e in convs
          if e.invars[0].aval.dtype == jnp.int8
          and e.invars[1].aval.dtype == jnp.int8
          and e.outvars[0].aval.dtype == jnp.int32]
    # stem stays bf16; every MBConv conv (16 blocks x 2-3 convs) is int8
    assert len(i8) >= 40, (len(i8), len(convs))


def test_int8_detector_finds_same_objects():
    """Peaked head weights (see test_export._peaked_checkpoint): the
    int8 detector must report the same classes with near-identical
    boxes as the stock bf16 apply + detect."""
    from yoloret_tpu.ops import detect_batch

    model = build_detector("mobilenetv2x75", num_classes=2)
    variables = _variables(model, seed=3, size=96)

    def amplify(tree, path=()):
        out = {}
        for k, val in tree.items():
            if isinstance(val, dict):
                out[k] = amplify(val, path + (k,))
            elif k == "kernel" and any("head" in p for p in path):
                out[k] = val * 4.0
            else:
                out[k] = val
        return out

    variables = {"params": amplify(variables["params"]),
                 "batch_stats": variables["batch_stats"]}
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 96, 96, 3).astype(np.float32)
    qp = quantize_from_data(model, variables,
                            rng.rand(8, 96, 96, 3).astype(np.float32))
    anchors = jnp.asarray(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], jnp.float32)
    hw = jnp.full((2, 2), 96.0, jnp.float32)

    def detect(outs):
        return detect_batch(outs, anchors, num_classes=2, image_hw=hw,
                            score_threshold=0.3, num_candidates=64)

    ref = detect(model.apply(variables, jnp.asarray(imgs), False))
    got = detect(int8_detector_apply(model, variables, qp,
                                     jnp.asarray(imgs)))
    rv, gv = np.asarray(ref.valid), np.asarray(got.valid)
    assert rv.sum() > 0, "peaked checkpoint produced no detections"
    for i in range(2):
        rc = sorted(np.asarray(ref.classes)[i][rv[i]].tolist())
        gc = sorted(np.asarray(got.classes)[i][gv[i]].tolist())
        assert rc == gc, (i, rc, gc)
        rb = np.asarray(ref.boxes)[i][rv[i]]
        gb = np.asarray(got.boxes)[i][gv[i]]
        # same detections within a few pixels at 96x96
        assert rb.shape == gb.shape
        order_r = np.lexsort(rb.T)
        order_g = np.lexsort(gb.T)
        np.testing.assert_allclose(rb[order_r], gb[order_g], atol=6.0)


def test_effnet_int8_features_close_to_f32():
    model = build_detector("efficientnetb0", num_classes=3)
    variables = _variables(model, size=64)
    rng = np.random.RandomState(0)
    calib = rng.rand(4, 64, 64, 3).astype(np.float32)
    x = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))

    from yoloret_tpu.nn.int8_infer import (
        calibrate_efficientnet,
        efficientnet_int8_features,
        quantize_efficientnet,
    )

    scales = calibrate_efficientnet(variables, [calib], variant="b0")
    qp = quantize_efficientnet(variables, scales, variant="b0")
    got = efficientnet_int8_features(qp, x, dtype=jnp.float32)
    want = model.apply(
        variables, x,
        method=lambda m, xx: m.body(xx.astype(jnp.float32), False))
    assert set(got) == {"c2", "c3", "c4", "c5"}
    for k in ("c2", "c3", "c4", "c5"):
        g, w = np.asarray(got[k], np.float32), np.asarray(want[k], np.float32)
        rel = np.sqrt(np.mean((g - w) ** 2)) / (np.sqrt(np.mean(w ** 2)) + 1e-8)
        corr = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert rel < 0.15, (k, rel)
        assert corr > 0.98, (k, corr)


def test_predictor_use_int8():
    """Predictor(use_int8=True) serves through the quantized backbone
    and returns the same classes as the underlying int8 apply."""
    from yoloret_tpu.infer import Predictor

    anchors = np.array(
        [[10, 13], [16, 30], [33, 23], [30, 61], [62, 45], [59, 119],
         [116, 90], [156, 198], [373, 326]], np.float32,
    )
    rng = np.random.RandomState(0)
    calib = rng.randint(0, 256, (8, 64, 64, 3), np.uint8)
    p = Predictor(
        class_names=["a", "b"], anchors=anchors, input_hw=(64, 64),
        score_threshold=0.2, bf16=False, use_int8=True,
        calibration_images=calib, batch_buckets=(1,),
    )
    assert p._qp is not None
    img = rng.randint(0, 256, (80, 100, 3), np.uint8)
    dets = p.detect_arrays([img])[0]
    # random weights score ~0.25 everywhere; the pipeline must run and
    # produce in-bounds boxes through the int8 backbone
    assert isinstance(dets, list)
    for d in dets:
        x1, y1, x2, y2 = d.box
        assert 0 <= x1 <= 100 and 0 <= y2 <= 80 + 1e-3


def test_int8_rejects_other_backbones():
    model = build_detector("yolo_fastest", num_classes=2)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    with pytest.raises(AssertionError):
        int8_detector_apply(model, variables, {}, x)


def test_int8_folded_epilogue_matches_legacy():
    """Scale-folded requant epilogues (_requant_folded: compute in
    output-scale units, one fewer VPU multiply per element) are the same
    math as the legacy dequant->act->requant chain — bitwise on CPU; a
    tiny off-by-one requant-rounding fraction is tolerated for other
    backends."""
    from yoloret_tpu.nn.int8_infer import mobilenetv2_int8_features

    model = build_detector("mobilenetv2x75", num_classes=3)
    variables = _variables(model)
    rng = np.random.RandomState(0)
    qp = quantize_from_data(
        model, variables, rng.rand(8, 96, 96, 3).astype(np.float32))
    x = jnp.asarray(rng.rand(2, 96, 96, 3).astype(np.float32))
    legacy = mobilenetv2_int8_features(qp, x, dtype=jnp.float32)
    folded = mobilenetv2_int8_features(qp, x, dtype=jnp.float32, folded=True)
    for k in legacy:
        a, b = np.asarray(legacy[k]), np.asarray(folded[k])
        scale = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() <= 0.05 * scale, k
        assert np.mean(np.abs(a - b) > 1e-9) < 0.01, k
