"""Device-side input double buffering.

The reference relies on tf.data's prefetch to overlap host work with
device steps (reference: code/yolo3/data.py:133 prefetch(AUTOTUNE)).
Here the host pipeline already overlaps decode via its own queue
(data/pipeline.py); this wrapper adds the DEVICE leg — it keeps
``size`` batches already transferred (and sharded) ahead of the
consumer, so the H2D copy of batch N+1 overlaps the compute of batch N.
"""

from __future__ import annotations

import collections
from typing import Any, Iterator, Optional

import jax


def device_prefetch(
    it: Iterator[Any],
    sharding: Optional[Any] = None,
    size: int = 2,
    local_data: bool = False,
) -> Iterator[Any]:
    """Yield batches from ``it`` with up to ``size`` already on device.

    ``local_data=True``: each leaf holds only THIS process's batch-axis
    slice (a process-sharded Dataset stream); the global array is
    assembled with ``jax.make_array_from_process_local_data`` so the
    multihost train step sees one sharded global batch while every host
    transferred only its own rows.
    """
    buf = collections.deque()

    def put(batch):
        def one(x):
            if getattr(x, "ndim", 1) == 0 or isinstance(x, (int, float)):
                return x  # host scalars (e.g. n_valid) stay host-side
            if sharding is None:
                return jax.device_put(x)
            if local_data:
                import numpy as np

                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                )
            return jax.device_put(x, sharding)

        return jax.tree.map(one, batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
