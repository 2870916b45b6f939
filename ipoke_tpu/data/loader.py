"""Host-side batching + prefetching feeding the device.

The reference uses torch DataLoader worker processes; here a thread-pool
prefetcher assembles numpy batches (the datasets are numpy-native) and an
optional device-put stage overlaps H2D with compute.  Deterministic given the
sampler seed.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import numpy as np


def collate(samples):
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


class DataLoader:
    def __init__(self, dataset, sampler, batch_size: int, drop_last: bool = True,
                 prefetch: int = 2, num_threads: int = 4):
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads

    def _batches(self) -> Iterator[list]:
        batch = []
        for idx in self.sampler:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler) // self.batch_size
        if not self.drop_last and len(self.sampler) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            with ThreadPoolExecutor(self.num_threads) as pool:
                for batch_idx in self._batches():
                    samples = list(pool.map(self.dataset.__getitem__, batch_idx))
                    q.put(collate(samples))
            q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item


def device_prefetch(it: Iterable, mesh=None, size: int = 2):
    """Overlap host->device transfer with compute.  With a mesh, batches are
    sharded over the 'data' axis; otherwise plain device_put."""
    import jax

    from ipoke_tpu.parallel import mesh as pmesh

    def put(batch):
        if mesh is not None:
            return pmesh.shard_batch(mesh, batch)
        return jax.tree_util.tree_map(jax.device_put, batch)

    buf = []
    it = iter(it)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
