from yoloret_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from yoloret_tpu.parallel.prefetch import device_prefetch

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "shard_batch",
    "device_prefetch",
]
