"""Host->device prefetch: keep N batches in flight while the step runs.

Replaces the reference's DataContainer scatter + background CUDA-stream H2D
copies (``/root/reference/codes/core/parallel/_functions.py:6-113``): JAX
transfers are already async; we simply stay ahead of the consumer by
``size`` device_puts.
"""

from __future__ import annotations

import collections
from typing import Any, Dict, Iterable, Iterator

from ..parallel.mesh import shard_batch


def prefetch_to_device(iterator: Iterable[Dict[str, Any]], mesh,
                       size: int = 2) -> Iterator[Dict[str, Any]]:
    queue = collections.deque()
    it = iter(iterator)

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(it)
            except StopIteration:
                return
            queue.append(shard_batch(
                {k: v for k, v in batch.items() if k != 'img_meta'}, mesh))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
