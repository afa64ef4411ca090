"""Data loading: shuffled epochs, collation, background prefetch.

Replaces the reference's torch DataLoader(num_workers=4, pin_memory=True)
(/root/reference/scripts/train_lora.py:193-209) with a dependency-free loader:
a shuffled index stream over a list-like dataset, collated on a background
thread so host-side batch prep overlaps device compute (the TPU analogue of
pinned-memory prefetch).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator

import numpy as np


class DataLoader:
    """Step-oriented loader: iterate() yields collated batches forever
    (reshuffling each epoch); one_epoch() yields a single pass."""

    def __init__(self, dataset, batch_size: int, collator: Callable,
                 shuffle: bool = True, seed: int = 42, drop_last: bool = True,
                 prefetch: int = 2, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collator = collator
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Parallel collation threads (the torch num_workers analogue; item
        # fetch + tokenize + pad overlap device compute; mel runs on device).
        self.num_workers = num_workers
        self.current_epoch = 0   # epoch of the most recently yielded batch

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx

    def _epoch_batches(self, epoch: int) -> Iterator[dict]:
        idx = self._epoch_indices(epoch)
        B = self.batch_size
        end = (len(idx) // B) * B if self.drop_last else len(idx)
        chunks = []
        for s in range(0, end, B):
            chunk = idx[s:s + B]
            if self.drop_last and len(chunk) < B:
                break
            chunks.append(chunk)

        def make(chunk):
            return self.collator([self.dataset[int(i)] for i in chunk])

        if self.num_workers > 0:
            # Bounded pipeline: at most num_workers + prefetch batches in
            # flight (Executor.map would eagerly submit the whole epoch and
            # buffer every completed batch -> host OOM on real datasets).
            from collections import deque
            from concurrent.futures import ThreadPoolExecutor
            depth = self.num_workers + max(self.prefetch, 1)
            with ThreadPoolExecutor(self.num_workers) as pool:
                pending: deque = deque()
                it = iter(chunks)
                for chunk in it:
                    pending.append(pool.submit(make, chunk))
                    if len(pending) >= depth:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
        else:
            for chunk in chunks:
                yield make(chunk)

    def one_epoch(self, epoch: int = 0) -> Iterator[dict]:
        yield from self._prefetched(self._epoch_batches(epoch))

    def iterate(self) -> Iterator[dict]:
        def gen():
            epoch = 0
            while True:
                for b in self._epoch_batches(epoch):
                    yield epoch, b
                epoch += 1

        for epoch, b in self._prefetched(gen()):
            self.current_epoch = epoch
            yield b

    def _prefetched(self, it: Iterator[dict]) -> Iterator[dict]:
        if self.prefetch <= 0:
            yield from it
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            try:
                for item in it:
                    q.put(item)
                q.put(stop)
            except BaseException as e:   # propagate to the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        return n if self.drop_last else -(-len(self.dataset) // self.batch_size)
