"""ImageNet backbone weight import from Keras H5 files.

The reference initializes backbones from the public Keras-applications /
qubvel H5 releases and copies them layer-by-layer into the detector
(truncated transfer learning, reference: code/yolo3/model.py:180-224;
EfficientNet weight table at code/yolo3/efficientnet.py:35-108). This
module converts those H5 files into this framework's param/batch-stat
pytrees:

  * MobileNetV2: by layer NAME (Conv1 / block_N_{expand,depthwise,
    project}[_BN] / Conv_1), robust to partial files (no_top).
  * EfficientNet: by ORDER — qubvel layer names are positional
    (conv2d_N / batch_normalization_N), but the build order matches our
    definition order exactly (stem, [expand], depthwise, SE reduce/
    excite, project per block, then top).

Layout notes: Keras conv kernels are HWIO like Flax; depthwise kernels
are (kh, kw, ch, 1) in Keras vs (kh, kw, 1, ch) in Flax grouped convs;
BN tuples (gamma, beta, moving_mean, moving_variance) split into params
(scale, bias) and batch_stats (mean, var).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _load_h5_weights(path: str) -> Dict[str, np.ndarray]:
    """Flatten an H5 weight file into {'layer/weight': array} with ':0'
    suffixes stripped; supports both keras-applications layouts."""
    import h5py

    out: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if isinstance(obj, h5py.Dataset):
            key = name
            if key.endswith(":0"):
                key = key[:-2]
            parts = [p for p in key.split("/") if p]
            # keras nests layer/layer/weight; drop the duplicate
            if len(parts) >= 2 and parts[0] == parts[1]:
                parts = parts[1:]
            if parts and parts[0] == "model_weights":
                parts = parts[1:]
            out["/".join(parts[-2:])] = np.asarray(obj)

    with h5py.File(path, "r") as f:
        f.visititems(visit)
    return out


def _dw(k: np.ndarray) -> np.ndarray:
    """Keras depthwise (kh, kw, ch, 1) -> Flax grouped (kh, kw, 1, ch)."""
    return np.transpose(k, (0, 1, 3, 2))


def _put(tree: dict, path: Tuple[str, ...], val: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def import_mobilenetv2_h5(
    path: str, expected_blocks: int = 16
) -> Tuple[dict, dict]:
    """Returns (params, batch_stats) subtrees for the ``body`` module of
    a MobileNetV2-backed detector."""
    w = _load_h5_weights(path)
    params: dict = {}
    stats: dict = {}

    def conv(keras_name, module_path, depthwise=False):
        key = f"{keras_name}/depthwise_kernel" if depthwise else f"{keras_name}/kernel"
        if key not in w:
            return False
        k = w[key]
        _put(params, module_path + ("kernel",), _dw(k) if depthwise else k)
        return True

    def bn(keras_name, module_path):
        if f"{keras_name}/gamma" not in w:
            return False
        _put(params, module_path + ("scale",), w[f"{keras_name}/gamma"])
        _put(params, module_path + ("bias",), w[f"{keras_name}/beta"])
        _put(stats, module_path + ("mean",), w[f"{keras_name}/moving_mean"])
        _put(stats, module_path + ("var",), w[f"{keras_name}/moving_variance"])
        return True

    assert conv("Conv1", ("stem", "conv")), "not a Keras MobileNetV2 H5"
    bn("bn_Conv1", ("stem", "bn"))
    # block 0 (Keras "expanded_conv", no expand conv)
    conv("expanded_conv_depthwise", ("block_0", "depthwise", "dwconv"), depthwise=True)
    bn("expanded_conv_depthwise_BN", ("block_0", "depthwise", "bn"))
    conv("expanded_conv_project", ("block_0", "project", "conv"))
    bn("expanded_conv_project_BN", ("block_0", "project", "bn"))
    for n in range(1, expected_blocks + 1):
        if not conv(f"block_{n}_expand", (f"block_{n}", "expand", "conv")):
            break
        bn(f"block_{n}_expand_BN", (f"block_{n}", "expand", "bn"))
        conv(f"block_{n}_depthwise", (f"block_{n}", "depthwise", "dwconv"), depthwise=True)
        bn(f"block_{n}_depthwise_BN", (f"block_{n}", "depthwise", "bn"))
        conv(f"block_{n}_project", (f"block_{n}", "project", "conv"))
        bn(f"block_{n}_project_BN", (f"block_{n}", "project", "bn"))
    if "Conv_1/kernel" in w:
        conv("Conv_1", ("top", "conv"))
        bn("Conv_1_bn", ("top", "bn"))
    return params, stats


def import_efficientnet_h5(path: str, body_params: Any) -> Tuple[dict, dict]:
    """Order-based import for qubvel EfficientNet H5 into the ``body``
    subtree whose structure is given by ``body_params`` (our init)."""
    w = _load_h5_weights(path)

    def indexed(prefix):
        """[(idx, name)] of qubvel positional layers, sorted."""
        names = {}
        for k in w:
            layer = k.split("/")[0]
            if layer == prefix:
                names.setdefault(0, layer)
            elif layer.startswith(prefix + "_"):
                suffix = layer[len(prefix) + 1 :]
                if suffix.isdigit():
                    names.setdefault(int(suffix), layer)
        return [names[i] for i in sorted(names)]

    convs = indexed("conv2d")
    dws = indexed("depthwise_conv2d")
    bns = indexed("batch_normalization")

    params: dict = {}
    stats: dict = {}
    ci = di = bi = 0

    def take_conv(module_path, bias=False):
        nonlocal ci
        name = convs[ci]
        ci += 1
        _put(params, module_path + ("kernel",), w[f"{name}/kernel"])
        if bias:
            _put(params, module_path + ("bias",), w[f"{name}/bias"])

    def take_dw(module_path):
        nonlocal di
        name = dws[di]
        di += 1
        _put(params, module_path + ("kernel",), _dw(w[f"{name}/depthwise_kernel"]))

    def take_bn(module_path):
        nonlocal bi
        name = bns[bi]
        bi += 1
        _put(params, module_path + ("scale",), w[f"{name}/gamma"])
        _put(params, module_path + ("bias",), w[f"{name}/beta"])
        _put(stats, module_path + ("mean",), w[f"{name}/moving_mean"])
        _put(stats, module_path + ("var",), w[f"{name}/moving_variance"])

    take_conv(("stem", "conv"))
    take_bn(("stem", "bn"))
    block_names = sorted(
        (k for k in body_params if k.startswith("stage_")),
        key=lambda s: (int(s.split("_")[1]), int(s.split("_")[3])),
    )
    for bname in block_names:
        block = body_params[bname]
        if "expand" in block:
            take_conv((bname, "expand", "conv"))
            take_bn((bname, "expand", "bn"))
        take_dw((bname, "depthwise", "dwconv"))
        take_bn((bname, "depthwise", "bn"))
        if "se" in block:
            take_conv((bname, "se", "reduce"), bias=True)
            take_conv((bname, "se", "excite"), bias=True)
        take_conv((bname, "project", "conv"))
        take_bn((bname, "project", "bn"))
    if ci < len(convs) and "top" in body_params:
        take_conv(("top", "conv"))
        take_bn(("top", "bn"))
    return params, stats


def load_backbone_weights(variables: Any, h5_path: str, backbone: str) -> Any:
    """Merge ImageNet backbone weights into a detector's variables.
    Shapes are validated against the initialized tree; mismatches raise."""
    import jax

    body_params = variables["params"]["body"]
    if backbone.startswith("mobilenetv2"):
        params, stats = import_mobilenetv2_h5(h5_path)
    elif backbone.startswith("efficientnet"):
        params, stats = import_efficientnet_h5(h5_path, body_params)
    else:
        raise ValueError(f"no H5 importer for backbone {backbone!r}")

    def merge(dst, src, where):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    continue  # e.g. 'top' not built in detector mode
                merge(dst[k], v, where + (k,))
            else:
                if k not in dst:
                    continue
                have = dst[k]
                if tuple(have.shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(where + (k,))}: "
                        f"h5 {v.shape} vs model {have.shape}"
                    )
                dst[k] = jax.numpy.asarray(v, have.dtype)

    import copy

    new_vars = {
        "params": copy.deepcopy(jax.device_get(variables["params"])),
        "batch_stats": copy.deepcopy(jax.device_get(variables["batch_stats"])),
    }
    merge(new_vars["params"]["body"], params, ("params", "body"))
    merge(new_vars["batch_stats"]["body"], stats, ("batch_stats", "body"))
    return jax.tree.map(jax.numpy.asarray, new_vars)
