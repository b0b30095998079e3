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
) -> Iterator[Any]:
    """Yield batches from ``it`` with up to ``size`` already on device."""
    buf = collections.deque()

    def put(batch):
        def one(x):
            if getattr(x, "ndim", 1) == 0 or isinstance(x, (int, float)):
                return x  # host scalars (e.g. n_valid) stay host-side
            if sharding is None:
                return jax.device_put(x)
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
