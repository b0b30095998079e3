"""Device-mesh helpers — the TPU-native replacement for the reference's
``tf.distribute`` strategies (reference: code/train.py:48-56,
code/yolo3/train.py:55-75).

The reference's only parallelism is data parallelism (MirroredStrategy /
TPUStrategy). Here a 2-D ``(data, model)`` jax.sharding.Mesh carries the
same plan: batches shard over the ``data`` axis, parameters replicate,
and XLA inserts the gradient all-reduce over ICI automatically when the
jitted train step consumes a sharded batch and produces replicated
parameter updates. The ``model`` axis ships size 1 (parity: the
reference has no TP) but keeps every entry point ready for spatial /
tensor sharding without an API change.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
jax.devices() then spans all hosts and the same code runs DCN+ICI.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, have {n}")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard images [B, H, W, C] with batch over ``data`` AND height over
    ``model`` — spatial parallelism for large inputs. GSPMD inserts the
    conv halo exchanges automatically; use with ``model`` mesh size > 1.
    (Beyond the reference, which is DP-only — SURVEY §2.3.)"""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree of arrays with the batch axis sharded over
    ``data``. Every leaf must have a leading axis divisible by the data
    axis size."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
