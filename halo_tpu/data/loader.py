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
    """Stack numpy arrays, list everything else. Arrays whose shapes
    differ across the batch (native-res origin_*/label fields on a
    mixed-resolution dataset) stay a list — they ride on host for the
    active round; the device paths consume only the uniform resized
    tensors (engine/learners.py:_TRAIN_KEYS)."""
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        first = vals[0]
        if isinstance(first, np.ndarray):
            if all(v.shape == first.shape for v in vals[1:]):
                out[key] = np.stack(vals)
            else:
                out[key] = vals
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
                 seed=0, drop_last=False, collate_fn=default_collate,
                 shard=None, pad_final=False, group_by_size=False):
        """``batch_size`` is always the GLOBAL batch.

        shard: optional (index, count) — yield only this process's
          contiguous 1/count slice of every global batch (the multi-host
          DDP-sampler analogue; see parallel/multihost.loader_shard).
          Requires drop_last or pad_final so slices stay even.
        pad_final: pad a trailing partial batch to full size by repeating
          its last sample; padded positions are flagged in the collated
          batch under ``is_pad`` (eval paths neutralize them by setting
          labels to ignore). When pad_final is set every yielded batch has
          an ``is_pad`` key.
        group_by_size: partition the epoch's index order into buckets of
          equal native resolution (``dataset.native_size(i)``, a cheap
          PNG-header probe) and batch within each bucket, so every yielded
          batch is single-resolution — required by the fused acquisition
          program, which traces one XLA executable per native size
          (active/region_selection.py). Bucketing is a deterministic
          function of the file list, so every host forms identical global
          batches. Requires the dataset to expose ``native_size``;
          uniform-size datasets (Cityscapes) form exactly the ungrouped
          batches.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.epoch = 0
        if shard is not None:
            index, count = shard
            if batch_size % count:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"{count} shards")
            if not (drop_last or pad_final):
                raise ValueError("shard requires drop_last or pad_final")
        self.shard = shard
        self.pad_final = pad_final
        if group_by_size and not hasattr(dataset, "native_size"):
            raise ValueError(
                "group_by_size requires the dataset to expose "
                "native_size(index)")
        self.group_by_size = group_by_size
        # hoisted off the per-sample hot path (inspect.signature per
        # fetch); the Grain backend caches the same bool in _RngSource
        self._rng_aware = _accepts_rng(dataset)

    def __len__(self):
        n = len(self.dataset)
        if self.group_by_size:
            # exact: each resolution bucket pads/drops its own trailing
            # partial batch (native_size is a cached header probe;
            # __iter__ already calls it for every index each epoch)
            counts: Dict[tuple, int] = {}
            for i in range(n):
                key = tuple(self.dataset.native_size(i))
                counts[key] = counts.get(key, 0) + 1
            if self.drop_last:
                return sum(c // self.batch_size for c in counts.values())
            return sum((c + self.batch_size - 1) // self.batch_size
                       for c in counts.values())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _fetch(self, index: int):
        rng = random.Random(f"{self.seed}-{self.epoch}-{index}")
        if self._rng_aware:
            return self.dataset.__getitem__(index, rng=rng)
        return self.dataset[index]

    def _local_indices(self, batch: List[int]):
        return local_batch_indices(batch, self.batch_size, self.shard,
                                   self.pad_final)

    def __iter__(self) -> Iterator[Dict]:
        order = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(f"{self.seed}-{self.epoch}").shuffle(order)

        if self.group_by_size:
            # Stable partition by native resolution: batches never mix
            # sizes, relative order within a bucket is preserved, buckets
            # are emitted in first-appearance order. Each bucket's trailing
            # partial batch is padded/dropped independently.
            buckets: Dict[tuple, List[int]] = {}
            for i in order:
                buckets.setdefault(tuple(self.dataset.native_size(i)),
                                   []).append(i)
            grouped = [b for bucket in buckets.values() for b in
                       (bucket[i:i + self.batch_size]
                        for i in range(0, len(bucket), self.batch_size))]
            batches = grouped
        else:
            batches = [order[i:i + self.batch_size]
                       for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        prefetch = 2 * self.num_workers
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []
            bi = 0
            while bi < len(batches) or pending:
                while bi < len(batches) and len(pending) < prefetch:
                    idxs, pads = self._local_indices(batches[bi])
                    futs = [pool.submit(self._fetch, i) for i in idxs]
                    pending.append((futs, pads))
                    bi += 1
                futs, pads = pending.pop(0)
                out = self.collate_fn([f.result() for f in futs])
                if self.pad_final:
                    out["is_pad"] = np.asarray(pads, bool)
                yield out
        self.epoch += 1


def local_batch_indices(batch: List[int], batch_size: int, shard,
                        pad_final: bool):
    """Pad a partial global batch, then take this shard's contiguous
    slice. Returns (indices, pad_flags) — pad positions repeat the
    batch's last real index. Shared by the threaded and Grain loaders so
    their shard semantics stay identical."""
    pads = [False] * len(batch)
    if pad_final and len(batch) < batch_size:
        n_pad = batch_size - len(batch)
        batch = batch + [batch[-1]] * n_pad
        pads = pads + [True] * n_pad
    if shard is not None:
        index, count = shard
        local = batch_size // count
        batch = batch[index * local:(index + 1) * local]
        pads = pads[index * local:(index + 1) * local]
    return batch, pads


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
