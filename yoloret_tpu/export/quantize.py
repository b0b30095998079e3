"""Post-training int8 weight quantization.

The reference threads a ``--quantize`` flag that is ultimately inert
(SURVEY §2.2: train.py:36, model.py:178) and exports TFLite with
OPTIMIZE_FOR_SIZE (yolo.py:386-394, weight compression). Here the
equivalent is real: symmetric per-output-channel int8 quantization of
every conv/dense kernel (~4x smaller weight artifact), with exact
dequantization back to the original dtype at load. BatchNorm/bias/
scalar parameters stay in f32 (negligible size, high sensitivity).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_tree(params: Any, min_size: int = 128) -> Tuple[Any, Dict[str, int]]:
    """Quantize all 'kernel' leaves with >= min_size elements.

    Returns (tree with {'q': int8, 'scale': f32[per out-channel]} in
    place of quantized leaves, stats dict).
    """
    stats = {"quantized": 0, "kept": 0, "bytes_fp": 0, "bytes_q": 0}

    def visit(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        arr = np.asarray(leaf)
        stats["bytes_fp"] += arr.nbytes
        if name == "kernel" and arr.size >= min_size and arr.ndim >= 2:
            # symmetric per-output-channel (last axis) scales
            flat = arr.reshape(-1, arr.shape[-1])
            scale = np.maximum(np.abs(flat).max(axis=0), 1e-8) / 127.0
            q = np.clip(np.round(arr / scale), -127, 127).astype(np.int8)
            stats["quantized"] += 1
            stats["bytes_q"] += q.nbytes + scale.astype(np.float32).nbytes
            return {"q": q, "scale": scale.astype(np.float32)}
        stats["kept"] += 1
        stats["bytes_q"] += arr.nbytes
        return arr

    out = jax.tree_util.tree_map_with_path(visit, params)
    return out, stats


def dequantize_tree(tree: Any, dtype=jnp.float32) -> Any:
    """Inverse of :func:`quantize_tree` (int8 -> dtype kernels)."""

    def is_q(node):
        return isinstance(node, dict) and set(node.keys()) == {"q", "scale"}

    def visit(node):
        if is_q(node):
            return (jnp.asarray(node["q"], dtype) * jnp.asarray(node["scale"], dtype))
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return jnp.asarray(node)

    return visit(tree)
