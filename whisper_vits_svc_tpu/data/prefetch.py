"""Background-thread batch prefetching.

The reference overlaps host IO with GPU compute via 4 DataLoader worker
processes (vits_extend/dataloader.py:20); here a single daemon thread +
bounded queue suffices: per-batch host work is file reads + numpy collate
(optionally the native C++ loader), and the TPU step is fully async anyway.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Iterate `iterable` on a daemon thread, keeping `depth` items ready."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    err: list[BaseException] = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            if err:
                raise err[0]
            return
        yield item
