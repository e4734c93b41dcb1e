"""Grain-backed data loader (optional production input pipeline).

The north-star plan (BASELINE.json) names Grain/tf.data for the input
pipeline; this adapter runs the same dataset objects through Grain's
multiprocess prefetching DataLoader as an alternative to the built-in
threaded loader (data/loader.py). Differences that matter:

  * worker processes (true parallel decode) with shared-memory transfer,
  * the same deterministic per-sample RNG contract
    (``random.Random(f"{seed}-{epoch}-{index}")``), so the two loaders
    produce identical streams for identical (seed, epoch) — pinned by
    tests/test_grain_loader.py,
  * batches come out through the same ``default_collate``.

Select with ``TPU.LOADER = "grain"`` (default "threads"). Note for the
active-learning protocols: worker *processes* do not see the in-process
mask cache, so Grain workers always take the disk path for masks — the
reference's own semantics (cityscapes.py:232-234).
"""

from __future__ import annotations

import random
from typing import Any, Dict, Iterator

from .loader import _accepts_rng, default_collate, local_batch_indices


class _RngSource:
    """Grain RandomAccessDataSource over our dataset with the loader's
    deterministic per-sample RNG."""

    def __init__(self, dataset, seed: int, epoch: int):
        self._dataset = dataset
        self._seed = seed
        self._epoch = epoch
        self._rng_aware = _accepts_rng(dataset)

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, index: int):
        index = int(index)
        if self._rng_aware:
            rng = random.Random(f"{self._seed}-{self._epoch}-{index}")
            return self._dataset.__getitem__(index, rng=rng)
        return self._dataset[index]


class GrainLoader:
    """Drop-in for data/loader.py:DataLoader backed by grain.python."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=4,
                 seed=0, drop_last=False, collate_fn=default_collate,
                 shard=None, pad_final=False):
        import grain.python  # noqa: F401 — fail fast if unavailable

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.epoch = 0
        if shard is not None and not (drop_last or pad_final):
            raise ValueError("shard requires drop_last or pad_final")
        self.shard = shard
        self.pad_final = pad_final

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _order(self):
        order = list(range(len(self.dataset)))
        if self.shuffle:
            # identical permutation to the threaded loader
            random.Random(f"{self.seed}-{self.epoch}").shuffle(order)
        return order

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import grain.python as pg

        source = _RngSource(self.dataset, self.seed, self.epoch)
        order = self._order()

        # Same global->local batch mapping as the threaded loader: cut the
        # global order into batches, pad/slice each, then flatten the local
        # visit order for the sampler and regroup the worker stream.
        global_batches = [order[i:i + self.batch_size]
                          for i in range(0, len(order), self.batch_size)]
        if (self.drop_last and global_batches
                and len(global_batches[-1]) < self.batch_size):
            global_batches.pop()
        local_batches = [local_batch_indices(b, self.batch_size, self.shard,
                                             self.pad_final)
                         for b in global_batches]
        order = [i for idxs, _pads in local_batches for i in idxs]

        class _OrderSampler(pg.Sampler):
            """Visit records in the threaded loader's exact order."""

            def __init__(self, order_):
                self._order = order_

            def __len__(self):
                return len(self._order)

            def __getitem__(self, index: int) -> pg.RecordMetadata:
                return pg.RecordMetadata(
                    index=index, record_key=self._order[index], rng=None)

        loader = pg.DataLoader(
            data_source=source,
            sampler=_OrderSampler(order),
            worker_count=self.num_workers,
            shard_options=pg.NoSharding(),
            operations=[],
        )

        import numpy as np

        stream = iter(loader)
        for idxs, pads in local_batches:
            batch = [next(stream) for _ in idxs]
            if not batch:
                continue
            out = self.collate_fn(batch)
            if self.pad_final:
                out["is_pad"] = np.asarray(pads, bool)
            yield out
        self.epoch += 1
