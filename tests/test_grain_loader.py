"""Grain loader parity: identical streams to the threaded loader."""

import numpy as np
import pytest

pytest.importorskip("grain.python")

from tests.conftest import make_mini_cfg
from halo_tpu.data import DataLoader, build_dataset
from halo_tpu.data.grain_loader import GrainLoader


def test_grain_matches_threaded_loader(mini_root, tmp_path):
    cfg = make_mini_cfg(mini_root, tmp_path)
    ds = build_dataset(cfg, mode="train", is_source=True, epochwise=True)

    a = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=5)
    b = GrainLoader(ds, batch_size=2, shuffle=True, num_workers=0, seed=5)
    batches_a = list(iter(a))
    batches_b = list(iter(b))
    assert len(batches_a) == len(batches_b)
    for ba, bb in zip(batches_a, batches_b):
        np.testing.assert_allclose(ba["img"], bb["img"])
        np.testing.assert_array_equal(ba["label"], bb["label"])
        assert ba["name"] == bb["name"]


def test_grain_worker_processes(mini_root, tmp_path):
    cfg = make_mini_cfg(mini_root, tmp_path)
    ds = build_dataset(cfg, mode="train", is_source=True, epochwise=True)
    g = GrainLoader(ds, batch_size=2, shuffle=False, num_workers=2, seed=1)
    batch = next(iter(g))
    assert batch["img"].shape == (2, 24, 48, 3)
