"""Background batch prefetching — the TPU-side analog of torch DataLoader's
worker+pin_memory pipeline (the reference relies on it everywhere:
sgm/data/video_dataset.py num_workers, recon/mesh_recon Lightning loaders).

Two pieces:
- ``PrefetchIterator``: a bounded-queue background-thread wrapper around any
  batch iterator, so host-side assembly (decode, crop, collate) overlaps
  device compute.
- ``device_prefetch``: additionally moves batches to device (optionally
  sharded) one step ahead, hiding the ~50ms/dispatch host->device transfer
  latency of the tunneled TPU behind the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

_SENTINEL = object()


class PrefetchIterator:
    """Pulls from ``it`` in a daemon thread into a bounded queue.

    Exceptions in the producer are re-raised in the consumer at the point of
    the failing item, preserving iterator semantics.
    """

    def __init__(self, it: Iterable, depth: int = 2):
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._err: Optional[BaseException] = None
        self._done = threading.Event()

        def run():
            try:
                for item in it:
                    if self._done.is_set():
                        return
                    self._q.put(item)
            except BaseException as e:  # re-raised on the consumer side
                self._err = e
            finally:
                self._q.put(_SENTINEL)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item

    def close(self) -> None:
        """Stop the producer (used when abandoning the stream early)."""
        self._done.set()
        while True:  # drain so the producer unblocks from put()
            try:
                if self._q.get_nowait() is _SENTINEL:
                    break
            except queue.Empty:
                break


def device_prefetch(it: Iterable, put_fn: Optional[Callable] = None,
                    depth: int = 2) -> Iterator:
    """Yield device-resident batches one step ahead of consumption.

    ``put_fn`` maps a host batch to device (e.g. ``trainer.shard_batch``);
    defaults to ``jax.device_put``.  The transfer for batch N+1 is issued
    while the caller computes on batch N (jax transfers are async), so the
    tunnel/PCIe latency is hidden.
    """
    import jax

    put = put_fn if put_fn is not None else jax.device_put
    src = PrefetchIterator(it, depth=depth)
    try:
        pending = None
        for batch in src:
            nxt = put(batch)
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending
    finally:
        # consumer stopped early (e.g. trainer hit max_steps): unblock and
        # stop the producer thread
        src.close()
