"""Thread-pooled, double-buffered data loader (torch-DataLoader replacement).

TPU-first input pipeline (SURVEY.md §7 hard part #5): worker threads fetch
and collate numpy batches while the device computes; the iterator keeps
``prefetch`` batches in flight. Designed for jit consumers — batches are
dicts of stacked numpy arrays (strings collected into lists).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def default_collate(items: list[dict]) -> dict:
    out: dict = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.floating, np.integer)):
            out[k] = np.asarray(vals)
        else:
            out[k] = vals  # strings / metadata
    return out


class DataLoader:
    """Iterates batches of a map-style dataset with background workers."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool = True,
                 num_workers: int = 4, prefetch: int = 2, seed: int = 0,
                 drop_last: bool = True, collate_fn=default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = max(1, prefetch)
        self.seed = seed
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for s in range(0, stop, self.batch_size):
            yield idx[s : s + self.batch_size]

    def __iter__(self):
        self.epoch += 1
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop_evt = threading.Event()

        def fetch_batch(ids):
            return self.collate_fn([self.dataset[int(i)] for i in ids])

        def producer():
            try:
                futures = []
                for ids in self._batch_indices():
                    if stop_evt.is_set():
                        return
                    futures.append(pool.submit(fetch_batch, ids))
                    while len(futures) >= self.prefetch:
                        q.put(("item", futures.pop(0).result()))
                for f in futures:
                    q.put(("item", f.result()))
                q.put(("done", None))
            except Exception as e:  # surface worker errors to the consumer
                q.put(("error", e))

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                kind, payload = q.get()
                if kind == "done":
                    return
                if kind == "error":
                    raise payload
                yield payload
        finally:
            stop_evt.set()
            pool.shutdown(wait=False, cancel_futures=True)
