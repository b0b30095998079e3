"""TF.js graph-model export — converter implemented from scratch.

The reference exports TF.js by saving its Keras model and shelling out
to ``tensorflowjs_converter`` (reference: code/yolo.py:333-348). That
pip package is not in this image, and jax2tf under jax>=0.9 emits only
``XlaCallModule`` ops the tfjs runtime cannot execute — so this module
does the whole job natively, in two steps:

1. **TF mirror** (`build_tf_mirror`): rebuild the detector's inference
   forward in plain TF ops from the same Flax ``variables`` tree, with
   every BatchNorm folded into the preceding conv (same fold as
   nn/fused_infer.py::fold_bn), so the traced graph contains only
   Conv2D / DepthwiseConv2dNative / BiasAdd / Relu6 / Sigmoid / Mul /
   AddV2 / Mean / MaxPool / ResizeNearestNeighbor / ConcatV2 / Reshape
   — every one of which is in the tfjs kernel registry.
2. **Graph-model writer** (`write_graph_model`): freeze the mirror to a
   GraphDef and write the exact artifact layout tensorflowjs_converter
   produces: ``model.json`` ({format: "graph-model", modelTopology =
   GraphDef as JSON, signature, weightsManifest}) plus 4 MB
   ``group1-shardNofM.bin`` shards holding every Const payload in
   manifest order (Const nodes in the topology keep dtype/shape but are
   stripped of their tensor content; the tfjs GraphModel executor
   resolves them from the loaded weight map by node name).

Like the reference's TFJS and TFLite exports, the artifact is the conv
stack: input ``images`` [B,H,W,3] RGB f32 in [0,1], outputs the three
raw per-scale head tensors [B,gh,gw,A,5+C] (decode/NMS run in the
consumer — f32 postprocess convention, docs/design.md). Backbones
covered: mobilenetv2* and efficientnetb* — every released reference
config (code/README.md:80-93). `read_graph_model` loads the artifact
back for verification; tests/test_tfjs.py pins mirror==JAX numerics and
a byte-exact artifact round trip.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any, Dict, List, Tuple

import numpy as np

from yoloret_tpu.configs import RunConfig
from yoloret_tpu.data.annotations import load_classes
from yoloret_tpu.nn.detector import BACKBONES, build_detector
from yoloret_tpu.utils.checkpoint import load_params

_BN_EPS = 1e-3  # every ConvBN/DepthwiseConvBN in nn/layers.py uses 1e-3

# The ops the mirror may emit. All are implemented by the tfjs runtime
# (tfjs-converter op registry); tests assert exported graphs stay inside
# this set so a future mirror change cannot silently produce an artifact
# the JS runtime rejects.
TFJS_SAFE_OPS = frozenset({
    "Placeholder", "Const", "Identity", "NoOp",
    "Conv2D", "DepthwiseConv2dNative", "BiasAdd",
    "Relu6", "Sigmoid", "Mul", "AddV2",
    "Mean", "MaxPool", "ResizeNearestNeighbor",
    "ConcatV2", "Reshape",
})


def _fold(p: Dict[str, Any], s: Dict[str, Any]) -> Tuple[np.ndarray, np.ndarray]:
    """BN-folded (kernel, bias) as numpy f32 for a {conv|dwconv, bn}
    scope (math identical to nn/fused_infer.py::fold_bn)."""
    kname = "conv" if "conv" in p else "dwconv"
    k = np.asarray(p[kname]["kernel"], np.float32)
    m = np.asarray(p["bn"]["scale"], np.float32) / np.sqrt(
        np.asarray(s["bn"]["var"], np.float32) + _BN_EPS
    )
    b = np.asarray(p["bn"]["bias"], np.float32) - np.asarray(
        s["bn"]["mean"], np.float32
    ) * m
    return k * m, b


class _TFMirror:
    """Walks the detector's Flax variables tree and emits the equivalent
    TF-ops forward. Module layout mirrored: nn/detector.py (assembly),
    nn/mobilenetv2.py + nn/efficientnet.py (backbones), nn/rfcr.py,
    nn/heads.py."""

    def __init__(self, tf, variables, backbone: str, num_anchors: int,
                 num_classes: int):
        self.tf = tf
        self.p = variables["params"]
        self.s = variables["batch_stats"]
        self.backbone = backbone
        self.num_anchors = num_anchors
        self.num_classes = num_classes

    # --- primitive layers -------------------------------------------------
    def _act(self, x, act):
        if act == "relu6":
            return self.tf.nn.relu6(x)
        if act == "swish":
            return x * self.tf.sigmoid(x)
        assert act is None
        return x

    def conv_bn(self, x, p, s, *, act, strides: int = 1, name: str):
        """ConvBN / DepthwiseConvBN with the BN folded into a BiasAdd."""
        tf = self.tf
        with tf.name_scope(name):
            k, b = _fold(p, s)
            if "dwconv" in p:
                # Flax depthwise kernel is [kh,kw,1,C]; TF wants [kh,kw,C,1]
                f = tf.constant(np.transpose(k, (0, 1, 3, 2)))
                x = tf.nn.depthwise_conv2d(
                    x, f, [1, strides, strides, 1], "SAME"
                )
            else:
                x = tf.nn.conv2d(x, tf.constant(k), strides, "SAME")
            x = tf.nn.bias_add(x, tf.constant(b))
            return self._act(x, act)

    def conv(self, x, p, *, name: str):
        """Bias-free plain 1x1 conv (RFCR collect / head pred convs)."""
        with self.tf.name_scope(name):
            return self.tf.nn.conv2d(
                x, self.tf.constant(np.asarray(p["kernel"], np.float32)),
                1, "SAME",
            )

    def maxpool(self, x, stride: int):
        return self.tf.nn.max_pool2d(x, stride, stride, "VALID")

    def upsample2x(self, x):
        h, w = int(x.shape[1]), int(x.shape[2])
        # Keras UpSampling2D semantics: nearest, no corner alignment
        return self.tf.compat.v1.image.resize_nearest_neighbor(
            x, [2 * h, 2 * w], align_corners=False, half_pixel_centers=False
        )

    def mbconv(self, x, p, s, *, act, stride: int, name: str):
        """InvertedResidual (act='relu6', no SE in tree) and MBConv
        (act='swish', SE in tree) share one walker: presence of
        'expand'/'se' and the kernel shapes carry the structure;
        drop-connect is identity at inference."""
        tf = self.tf
        inputs = x
        if "expand" in p:
            x = self.conv_bn(x, p["expand"], s["expand"], act=act,
                             name=f"{name}/expand")
        x = self.conv_bn(x, p["depthwise"], s["depthwise"], act=act,
                         strides=stride, name=f"{name}/depthwise")
        if "se" in p:
            with tf.name_scope(f"{name}/se"):
                g = tf.reduce_mean(x, [1, 2], keepdims=True)
                g = tf.nn.bias_add(
                    tf.nn.conv2d(
                        g,
                        tf.constant(np.asarray(p["se"]["reduce"]["kernel"],
                                               np.float32)),
                        1, "SAME"),
                    tf.constant(np.asarray(p["se"]["reduce"]["bias"],
                                           np.float32)))
                g = g * tf.sigmoid(g)  # swish
                g = tf.nn.bias_add(
                    tf.nn.conv2d(
                        g,
                        tf.constant(np.asarray(p["se"]["excite"]["kernel"],
                                               np.float32)),
                        1, "SAME"),
                    tf.constant(np.asarray(p["se"]["excite"]["bias"],
                                           np.float32)))
                x = x * tf.sigmoid(g)
        x = self.conv_bn(x, p["project"], s["project"], act=None,
                         name=f"{name}/project")
        if stride == 1 and int(inputs.shape[-1]) == int(x.shape[-1]):
            x = x + inputs
        return x

    # --- backbone ----------------------------------------------------------
    def backbone_feats(self, x) -> Dict[str, Any]:
        kind, kw = BACKBONES[self.backbone]
        p, s = self.p["body"], self.s["body"]
        feats: Dict[str, Any] = {}
        if kind == "mobilenetv2":
            from yoloret_tpu.nn.mobilenetv2 import _STAGES, _TAP_BLOCKS

            x = self.conv_bn(x, p["stem"], s["stem"], act="relu6",
                             strides=2, name="body/stem")
            block_id = -1
            for t, c, n, st in _STAGES:
                for i in range(n):
                    block_id += 1
                    if block_id > max(_TAP_BLOCKS):
                        break
                    bname = f"block_{block_id}"
                    x = self.mbconv(
                        x, p[bname], s[bname], act="relu6",
                        stride=st if i == 0 else 1, name=f"body/{bname}",
                    )
                    if block_id in _TAP_BLOCKS:
                        feats[_TAP_BLOCKS[block_id]] = x
            return feats
        if kind == "efficientnet":
            from yoloret_tpu.nn.efficientnet import (
                _TAP_STAGES,
                decode_block_args,
            )

            x = self.conv_bn(x, p["stem"], s["stem"], act="swish",
                             strides=2, name="body/stem")
            stages, _ = decode_block_args(kw["variant"])
            for si, stage in enumerate(stages):
                if si > max(_TAP_STAGES):
                    break
                for r in range(stage.num_repeat):
                    bname = f"stage_{si}_block_{r}"
                    x = self.mbconv(
                        x, p[bname], s[bname], act="swish",
                        stride=stage.strides[0] if r == 0 else 1,
                        name=f"body/{bname}",
                    )
                if si in _TAP_STAGES:
                    feats[_TAP_STAGES[si]] = x
            return feats
        raise ValueError(
            f"tfjs export covers the reference's released configs "
            f"(mobilenetv2*/efficientnetb* backbones); got {self.backbone!r}"
        )

    # --- RFCR (nn/rfcr.py) ---------------------------------------------------
    def rfcr(self, b1, b2, b3, b4):
        tf = self.tf
        p, s = self.p["rfcr"], self.s["rfcr"]
        b1c = self.conv(b1, p["collect_1"], name="rfcr/collect_1")
        b2c = self.conv(b2, p["collect_2"], name="rfcr/collect_2")
        b3c = self.conv(b3, p["collect_3"], name="rfcr/collect_3")
        b4c = self.conv(b4, p["collect_4"], name="rfcr/collect_4")
        alpha = np.asarray(p["fuse_weights"]["alpha"], np.float32)
        collected = [self.upsample2x(b1c), b2c, self.maxpool(b3c, 2), b4c]
        with tf.name_scope("rfcr/fuse_weights"):
            bc = tf.constant(alpha[0]) * collected[0]
            for i in range(1, 4):
                bc = bc + tf.constant(alpha[i]) * collected[i]
        fp, fs = p["fuse_conv"], s["fuse_conv"]
        bc = self.conv_bn(bc, fp["depthwise"], fs["depthwise"], act="relu6",
                          name="rfcr/fuse_conv/depthwise")
        bc = self.conv_bn(bc, fp["pointwise"], fs["pointwise"], act="relu6",
                          name="rfcr/fuse_conv/pointwise")
        out1 = tf.concat([b1, self.maxpool(bc, 2)], axis=-1)
        out2 = tf.concat([b2, bc], axis=-1)
        out3 = tf.concat([b3, self.upsample2x(bc)], axis=-1)
        return out1, out2, out3

    # --- neck (nn/heads.py) ---------------------------------------------------
    def head(self, x, name: str, with_pred: bool):
        p, s = self.p["neck"][name], self.s["neck"][name]
        x = self.conv_bn(x, p["expand"], s["expand"], act="relu6",
                         name=f"neck/{name}/expand")
        x = self.mbconv(x, p["mbconv"], s["mbconv"], act="swish", stride=1,
                        name=f"neck/{name}/mbconv")
        y = self.conv(x, p["pred"], name=f"neck/{name}/pred") if with_pred else None
        return x, y

    def squeeze(self, x, name: str):
        return self.conv_bn(x, self.p["neck"][name], self.s["neck"][name],
                            act="relu6", name=f"neck/{name}")

    def neck(self, b1, b2, b3):
        tf = self.tf
        c1, _ = self.head(b1, "fpn_head_32", with_pred=False)
        x = self.squeeze(c1, "fpn_squeeze_32")
        x = tf.concat([self.upsample2x(x), b2], axis=-1)
        c2, _ = self.head(x, "fpn_head_16", with_pred=False)
        x = self.squeeze(c2, "fpn_squeeze_16")
        x = tf.concat([self.upsample2x(x), b3], axis=-1)
        c3, _ = self.head(x, "fpn_head_8", with_pred=False)

        x, y3 = self.head(c3, "pan_head_8", with_pred=True)
        x = self.squeeze(x, "pan_squeeze_8")
        x = tf.concat([self.maxpool(x, 2), c2], axis=-1)
        x, y2 = self.head(x, "pan_head_16", with_pred=True)
        x = self.squeeze(x, "pan_squeeze_16")
        x = tf.concat([self.maxpool(x, 2), c1], axis=-1)
        _, y1 = self.head(x, "pan_head_32", with_pred=True)
        return y1, y2, y3

    # --- full forward -----------------------------------------------------
    def forward(self, images):
        tf = self.tf
        feats = self.backbone_feats(images)
        b4 = self.maxpool(feats["c2"], 4)
        r1, r2, r3 = self.rfcr(feats["c5"], feats["c4"], feats["c3"], b4)
        y1, y2, y3 = self.neck(r1, r2, r3)

        def split(y, i):
            b, gh, gw = (int(d) for d in y.shape[:3])
            y = tf.reshape(
                y, [b, gh, gw, self.num_anchors, 5 + self.num_classes]
            )
            return tf.identity(y, name=f"y{i}")

        return split(y1, 1), split(y2, 2), split(y3, 3)


def build_tf_mirror(cfg: RunConfig, batch: int = 1):
    """(tf.function raw(images) -> (y1,y2,y3), variables) — the plain
    TF-ops inference forward with weights inlined as graph constants.
    Raises ValueError for backbone families outside the reference's
    released configs (darknet/legacy full-bodies)."""
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    kind = BACKBONES[cfg.backbone][0]
    if kind not in ("mobilenetv2", "efficientnet"):
        raise ValueError(
            f"tfjs export covers the reference's released configs "
            f"(mobilenetv2*/efficientnetb* backbones); got {cfg.backbone!r}"
        )
    num_classes = len(load_classes(cfg.classes_path))
    model = build_detector(cfg.backbone, num_classes=num_classes,
                           dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *cfg.input_size, 3)), False
    )
    if cfg.model:
        variables = load_params(cfg.model, like=variables)
    mirror = _TFMirror(tf, variables, cfg.backbone,
                       num_anchors=model.num_anchors,
                       num_classes=num_classes)
    h, w = cfg.input_size
    raw = tf.function(
        mirror.forward,
        input_signature=[
            tf.TensorSpec([batch, h, w, 3], tf.float32, name="images")
        ],
        autograph=False,
    )
    return raw, variables


def write_graph_model(concrete_fn, out_dir: str,
                      shard_bytes: int = 4 * 1024 * 1024) -> str:
    """Serialize a frozen concrete function to the tfjs graph-model
    layout: model.json + group1-shardNofM.bin weight shards."""
    import tensorflow as tf
    from google.protobuf import json_format
    from tensorflow.python.framework import tensor_util

    if concrete_fn.captured_inputs:
        raise ValueError(
            "graph has captured inputs — weights must be inlined Consts"
        )
    graph_def = concrete_fn.graph.as_graph_def()

    blob = bytearray()
    manifest: List[Dict[str, Any]] = []
    for node in graph_def.node:
        if node.op != "Const":
            continue
        t = node.attr["value"].tensor
        arr = np.asarray(tensor_util.MakeNdarray(t))
        dtype = {"float32": "float32", "int32": "int32", "int64": "int32",
                 "bool": "bool"}.get(arr.dtype.name)
        if dtype is None:
            raise ValueError(f"unsupported Const dtype {arr.dtype} "
                             f"at node {node.name}")
        if arr.dtype.name == "int64":  # tfjs has no int64; converter narrows
            if arr.size and (np.abs(arr) > 2**31 - 1).any():
                raise ValueError(f"int64 Const {node.name} overflows int32")
            arr = arr.astype(np.int32)
            t.dtype = tf.int32.as_datatype_enum
            # retype every consumer attr that referenced this tensor?
            # (none emitted by the mirror; guarded by TFJS_SAFE_OPS tests)
        manifest.append({
            "name": node.name,
            "shape": [int(d) for d in arr.shape],
            "dtype": dtype,
        })
        blob += arr.tobytes()
        # Externalize the payload: keep dtype + shape, drop the content —
        # the tfjs executor resolves Const nodes from the weight map.
        t.ClearField("tensor_content")
        for field in ("half_val", "float_val", "double_val", "int_val",
                      "string_val", "int64_val", "bool_val", "uint32_val",
                      "uint64_val"):
            t.ClearField(field)

    os.makedirs(out_dir, exist_ok=True)
    n_shards = max(1, math.ceil(len(blob) / shard_bytes))
    paths = [f"group1-shard{i + 1}of{n_shards}.bin" for i in range(n_shards)]
    for i, path in enumerate(paths):
        with open(os.path.join(out_dir, path), "wb") as f:
            f.write(bytes(blob[i * shard_bytes:(i + 1) * shard_bytes]))

    def _sig(tensors, names=None):
        out = {}
        for i, tens in enumerate(tensors):
            key = names[i] if names else tens.name.split(":")[0]
            out[key] = {
                "name": tens.name,
                "dtype": "DT_FLOAT",
                "tensorShape": {
                    "dim": [{"size": str(int(d))} for d in tens.shape]
                },
            }
        return out

    from yoloret_tpu.version import __version__

    model_json = {
        "format": "graph-model",
        "generatedBy": f"tensorflow {tf.__version__}",
        "convertedBy": f"yoloret_tpu {__version__}",
        "signature": {
            "inputs": _sig(concrete_fn.inputs),
            "outputs": _sig(
                concrete_fn.outputs,
                [f"y{i + 1}" for i in range(len(concrete_fn.outputs))],
            ),
        },
        "modelTopology": json_format.MessageToDict(graph_def),
        "weightsManifest": [{"paths": paths, "weights": manifest}],
    }
    with open(os.path.join(out_dir, "model.json"), "w") as f:
        json.dump(model_json, f)
    return out_dir


def read_graph_model(model_dir: str):
    """Load a graph-model artifact back into an executable TF graph —
    the verification path for the writer (what the JS runtime would do).
    Returns (tf.Graph, signature dict)."""
    import tensorflow as tf
    from google.protobuf import json_format
    from tensorflow.python.framework import tensor_util

    with open(os.path.join(model_dir, "model.json")) as f:
        meta = json.load(f)
    group = meta["weightsManifest"][0]
    blob = b"".join(
        open(os.path.join(model_dir, p), "rb").read() for p in group["paths"]
    )
    np_dtypes = {"float32": np.float32, "int32": np.int32, "bool": np.bool_}
    weights: Dict[str, np.ndarray] = {}
    off = 0
    for w in group["weights"]:
        dt = np_dtypes[w["dtype"]]
        count = int(np.prod(w["shape"])) if w["shape"] else 1
        nbytes = count * np.dtype(dt).itemsize
        weights[w["name"]] = np.frombuffer(
            blob[off:off + nbytes], dt
        ).reshape(w["shape"])
        off += nbytes
    if off != len(blob):
        raise ValueError(f"weight shards hold {len(blob)} bytes but the "
                         f"manifest consumes {off}")

    graph_def = json_format.ParseDict(
        meta["modelTopology"], tf.compat.v1.GraphDef()
    )
    for node in graph_def.node:
        if node.op == "Const" and node.name in weights:
            node.attr["value"].tensor.CopyFrom(
                tensor_util.make_tensor_proto(weights[node.name])
            )
    graph = tf.Graph()
    with graph.as_default():
        tf.graph_util.import_graph_def(graph_def, name="")
    return graph, meta["signature"]


def export_tfjs_graph_model(cfg: RunConfig, out_dir: str,
                            batch: int = 1) -> str:
    """cfg -> tfjs graph-model directory (the reference's TFJS mode,
    code/yolo.py:333-348, without the external converter)."""
    raw, _ = build_tf_mirror(cfg, batch=batch)
    concrete = raw.get_concrete_function()
    return write_graph_model(concrete, out_dir)
