"""Multi-host (DCN) process coordination.

The reference runs multi-GPU single-host DDP and gates side effects on
rank 0 (reference: core/train_learners.py:292-294 initMask guard, :307-308
local_rank gate on RegionSelection). The JAX multi-host equivalent is a
process-level split:

  * exactly one process (the coordinator, ``jax.process_index() == 0``)
    performs shared-filesystem writes that must happen once — mask
    initialization, checkpoints, metrics.jsonl;
  * global batches are assembled from per-process loader shards with
    ``jax.make_array_from_process_local_data`` — each host reads only its
    contiguous slice of the global batch (the DDP-sampler analogue);
  * barriers (``sync_hosts``) order the coordinator's file writes before
    other hosts' reads, replacing the reference's unsynchronized lazy
    mask pickup (core/active/build.py:162-166 + cityscapes.py:232-234).

Every function degrades to a no-op / plain device_put in single-process
runs, so the single-host path pays nothing. Tests fake multi-host by
monkeypatching ``process_index`` / ``process_count`` here — all callers
route through this module.
"""

from __future__ import annotations

import jax


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_coordinator() -> bool:
    """True on the single process allowed to do once-per-run file writes."""
    return process_index() == 0


def sync_hosts(name: str) -> None:
    """Barrier across all processes (no-op single-process). Used to order
    coordinator file writes before other hosts' reads."""
    if process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def loader_shard():
    """(shard_index, shard_count) for DataLoader batch slicing, or None in
    single-process runs. Host p takes the p-th contiguous slice of every
    global batch, matching the contiguous per-process device blocks of a
    mesh built from ``jax.devices()``."""
    n = process_count()
    if n == 1:
        return None
    return (process_index(), n)


def make_global_array(local, sharding):
    """Assemble a global device array from this process's local slice.

    Single-process: a plain device_put (zero-copy onto the sharding).
    Multi-process: ``jax.make_array_from_process_local_data``, where
    ``local`` must be exactly this process's contiguous slice of the
    global batch (see ``loader_shard``).
    """
    if process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)


def any_host_flag(flag: bool) -> bool:
    """Logical OR of a process-local boolean across hosts (plain bool in
    single-process runs). All hosts must take the SAME branch on
    process-local events — e.g. a SIGTERM that landed on one host —
    before touching a barrier or a collective: a lone host entering
    ``sync_hosts`` while the rest run the (collective) train step
    deadlocks both sides. Multi-host cost is one 1-byte DCN allgather."""
    if process_count() == 1:
        return bool(flag)
    import numpy as np
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(np.asarray([bool(flag)]))
    return bool(np.asarray(flags).any())


def sum_over_hosts(values: dict) -> dict:
    """Element-wise sum of a {str: number} dict across hosts (identity in
    single-process runs). Used so per-process counts — e.g. the
    acquisition round's disjoint-writer stats — report round totals.
    Integer entries ride an int64 allgather (exact at any magnitude,
    not just below 2^53), float entries a float64 one. Every process
    must see the same dict keys; the int-vs-float partition, however, is
    AGREED across hosts first (one tiny int allgather): a key whose
    value is int on one host but float on another (e.g. a branch
    yielding 0 vs 0.0) would otherwise split the keys differently per
    host and issue mismatched collectives — a deadlock, not an error."""
    if process_count() == 1:
        return values
    import numpy as np
    from jax.experimental import multihost_utils

    def _gather(keys, dtype):
        arr = np.asarray([values[k] for k in keys], dtype)
        g = np.asarray(multihost_utils.process_allgather(arr))
        assert g.shape == (process_count(), len(keys)), g.shape
        return g.sum(axis=0)

    all_keys = sorted(values)
    local_is_int = np.asarray(
        [isinstance(values[k], (int, np.integer))
         and not isinstance(values[k], bool) for k in all_keys], np.int64)
    agreed = np.asarray(
        multihost_utils.process_allgather(local_is_int)).min(axis=0)
    int_keys = [k for k, flag in zip(all_keys, agreed) if flag]
    flt_keys = [k for k in all_keys if k not in int_keys]
    out = {}
    if int_keys:
        tot = _gather(int_keys, np.int64)
        out.update({k: type(values[k])(tot[i])
                    for i, k in enumerate(int_keys)})
    if flt_keys:
        tot = _gather(flt_keys, np.float64)
        # plain float even where this host's local value was int (mixed
        # int/float key): every host must return the identical total
        out.update({k: float(tot[i]) for i, k in enumerate(flt_keys)})
    return out


def broadcast_seed(seed: int) -> int:
    """Coordinator's seed wins on every host (identity single-process).
    Loader sharding assumes all processes shuffle the same global order,
    so a wall-clock-derived fallback seed must not diverge per host."""
    if process_count() == 1:
        return int(seed)
    import numpy as np
    from jax.experimental import multihost_utils

    agreed = multihost_utils.broadcast_one_to_all(
        np.asarray(seed, np.int64))
    return int(agreed)
