"""Host->HBM double-buffered prefetch (component C3).

The reference is synchronous per-frame (SURVEY.md §1.1 L0); the north-star
requires "double-buffered prefetch into HBM". A background thread decodes
and ``jax.device_put``s the next chunk while the device computes on the
current one, overlapping host IO with TPU compute. The queue depth bounds
host memory; `device_put` is async so the thread also overlaps H2D DMA.

This is the one shared-mutable-state site in the framework (SURVEY.md §5
race detection); it is a plain bounded queue with a sentinel protocol and a
dedicated stress test (slow consumer / fast producer) instead of a sanitizer.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax

_SENTINEL = object()


class DevicePrefetcher:
    """Iterate host batches; yield device-resident batches, prefetched.

    produce: iterable of host pytrees (e.g. stacked uint8 frame chunks).
    depth: number of chunks staged ahead (2 = classic double buffering).
    transform: optional host-side fn applied in the worker thread before
      device_put (e.g. np.stack of decoded JPEGs).
    """

    def __init__(
        self,
        produce: Iterable,
        depth: int = 2,
        transform: Optional[Callable] = None,
        device=None,
    ):
        self._queue: queue.Queue = queue.Queue(maxsize=max(depth, 1))
        self._device = device
        self._transform = transform
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(
            target=self._worker, args=(iter(produce),), daemon=True
        )
        self._thread.start()

    def _worker(self, it: Iterator):
        try:
            for item in it:
                if self._transform is not None:
                    item = self._transform(item)
                item = jax.device_put(item, self._device)
                self._queue.put(item)
        except BaseException as e:  # surfaced on the consumer side
            self._error = e
        finally:
            self._queue.put(_SENTINEL)

    def __iter__(self):
        while True:
            item = self._queue.get()
            if item is _SENTINEL:
                if self._error is not None:
                    raise self._error
                return
            yield item


def prefetch_to_device(iterable, depth: int = 2, transform=None, device=None):
    """Functional wrapper: ``for batch in prefetch_to_device(chunks): ...``"""
    return iter(DevicePrefetcher(iterable, depth=depth, transform=transform,
                                 device=device))
