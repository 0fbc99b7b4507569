"""Composable streaming data pipeline (host-side, torch-free).

Rebuilds the reference's IterableDataset machinery
(cosyvoice/dataset/dataset.py:26-161): a ``DataList`` source with
epoch-seeded shuffling and rank/worker partitioning, plus a ``Processor``
chain applied lazily.  On TPU the input pipeline runs on host CPU and feeds
jitted train steps with padded numpy batches (data parallel sharding
happens in the train step via jax.sharding, not here — each HOST shards the
list like benchmark_moss_decoder.py:175-189)."""

from __future__ import annotations

import random
from typing import Callable, Iterable, Iterator, List, Sequence


class DataList:
    """List of shard descriptors with deterministic per-epoch shuffling and
    rank/worker partitioning."""

    def __init__(self, lists: Sequence, shuffle: bool = True,
                 partition: bool = True, rank: int = 0, world_size: int = 1,
                 worker_id: int = 0, num_workers: int = 1):
        self.lists = list(lists)
        self.shuffle = shuffle
        self.partition = partition
        self.rank = rank
        self.world_size = world_size
        self.worker_id = worker_id
        self.num_workers = num_workers
        self.epoch = -1

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[dict]:
        data = list(self.lists)
        if self.shuffle:
            rng = random.Random(self.epoch)
            rng.shuffle(data)
        if self.partition:
            data = data[self.rank::self.world_size]
        data = data[self.worker_id::self.num_workers]
        for src in data:
            yield {"src": src, "epoch": self.epoch}


def build_pipeline(source: Iterable, processors: Sequence[Callable]
                   ) -> Iterable:
    """Chain processors: each is a generator fn ``f(iterable, **kw)`` —
    use functools.partial to bind kwargs (the reference binds via
    hyperpyyaml !name: partials)."""
    it = source
    for p in processors:
        it = p(it)
    return it


class Prefetcher:
    """Background-thread prefetch for the host input pipeline — keeps the
    accelerator fed while parquet decode / mel extraction run on CPU (the
    role of torch DataLoader workers, train_utils.py:54-76)."""

    _DONE = object()

    def __init__(self, iterable: Iterable, depth: int = 4):
        import queue
        import threading
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err = None

        def worker():
            try:
                for item in iterable:
                    self._q.put(item)
            except BaseException as e:          # surface in consumer
                self._err = e
            finally:
                self._q.put(self._DONE)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._DONE:
                if self._err is not None:
                    raise self._err
                return
            yield item
