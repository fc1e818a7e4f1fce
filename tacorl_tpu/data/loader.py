"""Host-side batching + prefetch.

Replaces torch DataLoader workers (reference: basic_data_module.py:132-158)
with a thread-pooled sampler feeding a bounded prefetch queue; batches are
dict-of-numpy pytrees, optionally pushed to the device mesh one step ahead so
host IO overlaps TPU compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, Optional, Sequence

import numpy as np

__all__ = ["collate", "DataLoader", "device_prefetch"]


def collate(items: Sequence[Dict]) -> Dict:
    """Stack a list of sample dicts into a dict-of-arrays batch (recursive)."""
    first = items[0]
    if isinstance(first, dict):
        return {k: collate([it[k] for it in items]) for k in first}
    return np.stack(items)


class DataLoader:
    """Iterates shuffled (or sequential) batches of ``dataset.sample(idx, rng)``
    items. ``percentage`` keeps the leading fraction of indices, matching the
    reference's Subset behavior (basic_data_module.py:111-123)."""

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        percentage: float = 1.0,
        prefetch: int = 2,
        num_threads: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.n = int(len(dataset) * percentage)
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def _index_order(self) -> np.ndarray:
        order = np.arange(self.n)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict]:
        order = self._index_order()
        self.epoch += 1
        batches = [
            order[i : i + self.batch_size]
            for i in range(0, self.n, self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        def produce(batch_idx: int, indices: np.ndarray) -> Dict:
            # packed-storage datasets expose a native batched gather
            if getattr(self.dataset, "supports_batch", lambda: False)():
                rng = np.random.default_rng((self.seed, self.epoch, batch_idx))
                return self.dataset.sample_batch(indices, rng)
            items = []
            for j, idx in enumerate(indices):
                rng = np.random.default_rng(
                    (self.seed, self.epoch, batch_idx, int(idx))
                )
                items.append(self.dataset.sample(int(idx), rng))
            return collate(items)

        if self.prefetch <= 0:
            for bi, b in enumerate(batches):
                yield produce(bi, b)
            return

        if self.num_threads > 1:
            # Pooled producers (reference: num_workers=4 DataLoader
            # processes, basic_data_module.py:132-158). Threads suffice
            # here because the per-frame npz decode releases the GIL in
            # zlib/numpy; batches are yielded strictly in order and every
            # batch's RNG is keyed by (seed, epoch, batch_idx[, item_idx]),
            # so parallelism cannot change the produced values.
            yield from self._iter_pooled(batches, produce)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                for bi, b in enumerate(batches):
                    if stop.is_set():
                        return
                    q.put(produce(bi, b))
            except BaseException as e:  # surface loader errors to consumer
                q.put(e)
            finally:
                q.put(None)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def _iter_pooled(self, batches, produce) -> Iterator[Dict]:
        import collections
        from concurrent.futures import ThreadPoolExecutor

        window = self.prefetch + self.num_threads
        pool = ThreadPoolExecutor(max_workers=self.num_threads)
        try:
            pending: "collections.deque" = collections.deque()
            it = iter(enumerate(batches))
            exhausted = False
            while True:
                while not exhausted and len(pending) < window:
                    try:
                        bi, b = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    pending.append(pool.submit(produce, bi, b))
                if not pending:
                    return
                yield pending.popleft().result()
        finally:
            # consumer may abandon the iterator early (generator close):
            # don't block teardown on up-to-`window` queued produce() calls.
            # At interpreter shutdown the generator may be finalized after
            # concurrent.futures' module globals are cleared — swallow the
            # resulting AttributeError instead of spraying it to stderr.
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                pass


def device_prefetch(iterator: Iterator, put_fn: Callable[[Any], Any], depth: int = 1):
    """Keep ``depth`` batches in flight on device: put_fn (e.g. shard_batch)
    runs on the next host batch while the current device batch computes."""
    import collections

    buf = collections.deque()
    for batch in iterator:
        buf.append(put_fn(batch))
        if len(buf) > depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
