"""Threaded prefetching batch loader.

Replaces torch DataLoader workers (custom_dataset_data_loader.py:5-25)
with a thread pool that decodes/collates ahead of device compute and
optionally device_puts each batch sharded over the data mesh — so the
TPU never waits on host IO (SURVEY §2.3 host-pipeline plan).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def _collate(samples):
    out = {}
    for key in samples[0]:
        out[key] = np.stack([s[key] for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 num_workers: int = 2, prefetch: int = 4, seed: int = 0,
                 drop_last: bool = True, mesh=None,
                 shard_index: int = 0, shard_count: int = 1):
        """``shard_index``/``shard_count``: multi-host data sharding. Every
        process builds the SAME globally-shuffled index stream (common
        ``seed``) in global batches of ``batch_size * shard_count`` rows
        and takes its own disjoint ``batch_size``-row slice per step — so
        ``global_shard_batch`` assembles a true global batch instead of
        ``shard_count`` copies of the same samples."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        self.mesh = mesh
        assert 0 <= shard_index < shard_count, (shard_index, shard_count)
        self.shard_index = shard_index
        self.shard_count = shard_count
        self._epoch = 0

    def __len__(self):
        global_bs = self.batch_size * self.shard_count
        n = len(self.dataset) // global_bs
        if not self.drop_last and len(self.dataset) % global_bs:
            n += 1
        return max(n, 1)

    def _batches_of_indices(self):
        n = len(self.dataset)
        global_bs = self.batch_size * self.shard_count
        idx = np.arange(max(n, global_bs))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        lo = self.shard_index * self.batch_size
        for i in range(0, len(idx) - global_bs + 1, global_bs):
            g = idx[i:i + global_bs] % max(n, 1)
            yield g[lo:lo + self.batch_size]

    def __iter__(self) -> Iterator[dict]:
        self._epoch += 1
        batch_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        index_batches = list(self._batches_of_indices())
        cursor = {"i": 0}
        lock = threading.Lock()
        n_batches = len(index_batches)
        results = {}
        done = threading.Event()

        def worker():
            while not done.is_set():
                with lock:
                    i = cursor["i"]
                    if i >= n_batches:
                        return
                    cursor["i"] += 1
                batch = _collate([self.dataset[int(j)] for j in index_batches[i]])
                batch_q.put((i, batch))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            next_emit = 0
            pending = {}
            received = 0
            while next_emit < n_batches:
                if next_emit in pending:
                    batch = pending.pop(next_emit)
                else:
                    i, batch = batch_q.get()
                    received += 1
                    if i != next_emit:
                        pending[i] = batch
                        continue
                next_emit += 1
                if self.mesh is not None:
                    from impersonator_tpu.parallel import shard_batch
                    batch = shard_batch(batch, self.mesh)
                yield batch
        finally:
            done.set()
            # drain so workers blocked on put() can exit
            while not batch_q.empty():
                try:
                    batch_q.get_nowait()
                except queue.Empty:
                    break
