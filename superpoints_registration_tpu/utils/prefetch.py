"""Background-thread batch prefetcher.

The reference relies on torch DataLoader workers; here a small thread pool
overlaps host-side collation/augmentation with device steps (the device is
busy while the next batch is built).
"""
from __future__ import annotations

import queue
import threading


class Prefetcher:
    """Wrap a batch iterator; keeps up to `depth` ready batches."""

    def __init__(self, iterator, depth: int = 2):
        self._it = iterator
        self._q = queue.Queue(maxsize=depth)
        self._done = object()
        self._err = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        try:
            for item in self._it:
                self._q.put(item)
        except BaseException as e:  # surface worker errors on the main thread
            self._err = e
        finally:
            self._q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._done:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item
