"""Host-side batch prefetching (the reference hides host work behind 8
torch DataLoader workers, /root/reference/dataset.py:460-470).

TPU-first shape of the same idea: a single background thread runs the host
stages (dataset indexing, poison blit, tokenize-collate, optional
host->device transfer) for the NEXT batches while the device executes the
current step.  JAX dispatch is already async, so one thread of lookahead is
enough to hide the host time — numpy/tokenizer work releases the GIL for
the array-heavy parts, and the device never idles waiting on the host as
long as host-time-per-batch < device-time-per-step.

``prefetch(it, depth)`` wraps any iterator; exceptions propagate to the
consumer at the point of `next()`, and an abandoned consumer (generator
closed / GC'd) stops the worker promptly via the bounded queue + sentinel
protocol rather than leaking a thread per epoch.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_END = object()


def prefetch(
    iterable: Iterable,
    depth: int = 2,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Iterate ``iterable`` on a background thread, ``depth`` items ahead.

    ``transform`` (e.g. a tokenizing collate or a device_put) runs on the
    worker thread too, so its cost overlaps device compute.
    """
    if depth <= 0:
        for item in iterable:
            yield transform(item) if transform is not None else item
        return

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        """Bounded put that re-checks the stop event; True if delivered."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker() -> None:
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                if not put_or_stop(item):
                    return
            put_or_stop(_END)
        except BaseException as e:  # propagate to the consumer
            put_or_stop(e)

    t = threading.Thread(target=worker, daemon=True, name="villan-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
