"""Minimal batch pipeline: map-style dataset -> shuffled fixed-size batches.

Replaces torch DataLoader (reference TrainDataLoader/EvalDataLoader,
`egs/wsj0-mix/common/src/dataset.py:625-683`). Batches are stacked numpy
arrays with STATIC shapes (drop_last=True by default for training) so every
step hits the same compiled XLA program.

`num_workers`/`prefetch` add a background pipeline (the counterpart of the
reference's num_workers): a thread pool loads items (wav IO and numpy
slicing release the GIL) and up to `prefetch` assembled batches are staged
ahead of the training step, overlapping host IO with device compute.
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        shuffle: bool = False,
        drop_last: Optional[bool] = None,
        seed: int = 0,
        collate_fn=None,
        num_workers: int = 0,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.rng = np.random.default_rng(seed)
        self.collate_fn = collate_fn
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_starts(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        return order, range(0, end, self.batch_size)

    def _assemble(self, idxs):
        items = [self.dataset[int(j)] for j in idxs]
        if self.collate_fn is not None:
            return self.collate_fn(items)
        return tuple(np.stack(field) for field in zip(*items))

    def __iter__(self):
        order, starts = self._batch_starts()
        if self.num_workers <= 0:
            for i in starts:
                yield self._assemble(order[i : i + self.batch_size])
            return

        # Background pipeline: pool loads items per batch, a producer thread
        # keeps up to `prefetch` ready batches staged. Submission is LAZY
        # (at most num_workers + prefetch futures outstanding) so a long
        # epoch never materializes ahead of consumption, and a `stop` event
        # lets an abandoned iterator (e.g. `next(iter(loader))`) tear the
        # producer down instead of loading the rest of the epoch.
        import collections

        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        sentinel = object()
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    start_iter = iter(starts)
                    pending: collections.deque = collections.deque()

                    def submit_next():
                        for i in start_iter:
                            pending.append(pool.submit(
                                self._assemble, order[i : i + self.batch_size]))
                            return

                    for _ in range(self.num_workers + q.maxsize):
                        submit_next()
                    while pending and not stop.is_set():
                        result = pending.popleft().result()
                        while not stop.is_set():
                            try:
                                q.put(result, timeout=0.1)
                                break
                            except queue.Full:
                                continue
                        submit_next()
                    for fut in pending:  # abandoned: drop unconsumed work
                        fut.cancel()
            except BaseException as exc:  # surface worker errors to the consumer
                # Retry like the normal path: a single timed put could be
                # dropped while the consumer is busy (e.g. inside a long jit
                # compile), leaving the iterator blocked forever with neither
                # an exception nor a sentinel enqueued.
                while not stop.is_set():
                    try:
                        q.put(exc, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                return
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                out = q.get()
                if out is sentinel:
                    break
                if isinstance(out, BaseException):
                    raise out
                yield out
        finally:
            stop.set()
            try:  # unblock a producer stuck on q.put
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            thread.join(timeout=10)


def prefetch_to_device(iterable, size: int = 2, sharding=None):
    """Double-buffered device prefetch: keep `size` batches' host->device
    transfers in flight ahead of the consumer.

    jax.device_put is asynchronous, so staging the next batch while the
    current step runs overlaps PCIe/DMA with device compute — the TPU
    counterpart of the reference DataLoader's pinned-memory + num_workers
    overlap. Pass a NamedSharding to land the batch already sharded over the
    mesh (no later resharding copy).
    """
    import collections
    import itertools

    import jax

    def put(x):
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    buf: collections.deque = collections.deque()
    it = iter(iterable)

    def enqueue(n):
        for batch in itertools.islice(it, n):
            buf.append(jax.tree_util.tree_map(put, batch))

    enqueue(size)
    while buf:
        yield buf.popleft()
        enqueue(1)
