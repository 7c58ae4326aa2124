"""Background device prefetcher: overlap host batch assembly with compute.

The reference overlaps loading with compute via DataLoader worker processes
(dataset_builder.py:157-183). TPU-native equivalent: a bounded background
thread that assembles the next batches (native fastnpy reads + normalize)
and `device_put`s them with the mesh sharding while the current step runs
on device. JAX dispatch is async, so depth=2 fully hides host time as long
as assembly < step time.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a batch iterator; stage `depth` device-put batches ahead."""

    def __init__(self, batches: Iterable, put_fn: Callable, depth: int = 2):
        self._src = batches
        self._put = put_fn
        self._q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._err: BaseException | None = None
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill, daemon=True)
        self._thread.start()

    def _enqueue(self, item) -> bool:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def _fill(self):
        try:
            for b in self._src:
                if not self._enqueue(self._put(b)):
                    return  # consumer closed early
        except BaseException as e:  # surfaced on the consumer side
            self._err = e
        finally:
            self._enqueue(_SENTINEL)

    def close(self) -> None:
        """Unblock and join the producer (safe after partial consumption)."""
        self._stop.set()
        while True:  # drain so a blocked put can finish
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5)

    def __iter__(self) -> Iterator:
        try:
            while True:
                item = self._q.get()
                if item is _SENTINEL:
                    if self._err is not None:
                        raise self._err
                    return
                yield item
        finally:
            self.close()
