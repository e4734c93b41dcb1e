"""Device mesh + sharding helpers: the SPMD replacement for DDP/NCCL.

The reference scales with Lightning DDP over NCCL (reference: train.py:119,
core/train_learners.py:132-134): per-rank processes, implicit gradient
buckets, all_gather for metrics. The TPU-native equivalent is ONE jitted
program over a ``jax.sharding.Mesh``:

  * batch axis sharded over the ``data`` mesh axis (ICI); XLA inserts the
    gradient psum during backward — no NCCL, no buckets, no process group.
  * metric histograms are reduced with the same compiled psum instead of
    all_gather-then-sum (fixing the reference's single-GPU-only test
    aggregation bug, train_learners.py:652-654).
  * BatchNorm batch stats reduce over the global (sharded) batch, i.e.
    sync-BN falls out of GSPMD for free (train.py:129).

A ``model`` axis is provisioned for optional spatial sharding of the
acquisition score map (SURVEY.md §5 long-context note); the shipped recipes
keep it at size 1.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_parallel: int = -1, spatial_parallel: int = 1,
                devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    data_parallel=-1 uses all devices / spatial_parallel.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel == -1:
        data_parallel = n // spatial_parallel
    need = data_parallel * spatial_parallel
    if need > n:
        raise ValueError(
            f"mesh {data_parallel}x{spatial_parallel} needs {need} devices, "
            f"have {n}")
    grid = np.asarray(devices[:need]).reshape(data_parallel, spatial_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put a host batch with the leading axis sharded over 'data'.
    Non-array entries (paths, names) pass through on host."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 1:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
