from yoloret_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
    spatial_sharding,
)
from yoloret_tpu.parallel.prefetch import device_prefetch

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_batch",
    "spatial_sharding",
    "device_prefetch",
]
