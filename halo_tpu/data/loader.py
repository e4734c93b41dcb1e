"""Host-side threaded data loader with deterministic per-sample RNG.

Replaces the reference's torch DataLoader worker processes
(reference: core/train_learners.py:463-486, 4 workers/loader) with a thread
pool + sliding prefetch window: PIL decode, numpy remap and resize all
release the GIL, so threads saturate host cores without process-spawn or
tensor IPC overhead, and arrays land already channel-last for device put.
"""

from __future__ import annotations

import random
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np


def default_collate(samples: List[Dict]) -> Dict:
    """Stack numpy arrays, list everything else."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            out[key] = np.stack(vals)
        elif isinstance(first, (int, float, np.integer, np.floating)):
            out[key] = np.asarray(vals)
        else:
            out[key] = vals
    return out


class DataLoader:
    """Iterates batches of collated numpy samples.

    Determinism: sample ``i`` of epoch ``e`` always sees
    ``random.Random((seed, e, i))`` regardless of worker count, unlike the
    reference's global-RNG transforms (transform.py:87,125).
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=4,
                 seed=0, drop_last=False, collate_fn=default_collate):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _fetch(self, index: int):
        rng = random.Random(f"{self.seed}-{self.epoch}-{index}")
        item = self.dataset.__getitem__(index, rng=rng) if _accepts_rng(
            self.dataset) else self.dataset[index]
        return item

    def __iter__(self) -> Iterator[Dict]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(f"{self.seed}-{self.epoch}").shuffle(order)

        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        prefetch = 2 * self.num_workers
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            bi = 0
            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) < prefetch:
                    futs = [pool.submit(self._fetch, i) for i in batches[bi]]
                    pending.append(futs)
                    bi += 1
                futs = pending.pop(0)
                yield self.collate_fn([f.result() for f in futs])
        self.epoch += 1


def _accepts_rng(dataset) -> bool:
    import inspect
    try:
        sig = inspect.signature(dataset.__getitem__)
    except (TypeError, ValueError):
        return False
    return "rng" in sig.parameters


class DevicePrefetcher:
    """Wraps a DataLoader iterator and overlaps host->device transfer with
    compute via jax.device_put one batch ahead."""

    def __init__(self, iterator, device_put_fn):
        self._it = iter(iterator)
        self._put = device_put_fn
        self._next = None
        self._advance()

    def _advance(self):
        try:
            self._next = self._put(next(self._it))
        except StopIteration:
            self._next = None

    def __iter__(self):
        return self

    def __next__(self):
        if self._next is None:
            raise StopIteration
        batch = self._next
        self._advance()
        return batch
