"""Background batch prefetching.

The reference relies on torch DataLoader workers for this; here a small
thread overlaps host-side collation (graph batching, padding, numpy
concats) with device compute — on TPU workloads host collate is comparable
to the device step time for small molecular graphs, so overlapping it
roughly doubles throughput.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(iterator: Iterable, size: int = 2) -> Iterator:
    """Run ``iterator`` in a daemon thread, buffering up to ``size`` items.

    Exceptions in the producer are re-raised at the consumer. The producer
    thread dies with the consumer (daemon), so abandoning the iterator
    mid-epoch is safe.
    """
    q: queue.Queue = queue.Queue(maxsize=size)

    def producer():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # noqa: BLE001 — forwarded to consumer
            q.put((_SENTINEL, e))
            return
        q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        if isinstance(item, tuple) and len(item) == 2 \
                and item[0] is _SENTINEL:
            raise item[1]
        yield item
