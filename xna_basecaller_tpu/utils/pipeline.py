"""Host-side pipeline concurrency: background iterators over bounded queues.

Same pattern as the reference's thread pipeline library (reference:
ub-bonito/bonito/multiprocessing.py:20-160): each stage runs in its own
thread, handing items over a bounded queue with a sentinel for termination,
so host preprocessing, device compute, and host postprocessing overlap.
Safety is by construction: single producer/consumer per queue, one writer
thread owning each output stream.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


class BackgroundIterator:
    """Runs an iterator in a background thread with a bounded queue."""

    def __init__(self, iterable: Iterable, maxsize: int = 2,
                 name: str = "pipeline"):
        self._iterable = iterable
        self._queue: queue.Queue = queue.Queue(maxsize)
        self._exc: BaseException | None = None
        self._thread = threading.Thread(
            target=self._run, name=name, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._iterable:
                self._queue.put(item)
        except BaseException as e:  # propagate to consumer
            self._exc = e
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self) -> Iterator:
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                if self._exc is not None:
                    raise self._exc
                return
            yield item

    def join(self):
        self._thread.join()


def thread_iter(iterable: Iterable, maxsize: int = 2) -> BackgroundIterator:
    """Begin consuming ``iterable`` in a background thread."""
    return BackgroundIterator(iterable, maxsize)
