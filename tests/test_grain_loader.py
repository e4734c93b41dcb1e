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


def test_grain_workers_match_threaded_across_epochs(mini_root, tmp_path):
    """Worker-process path (LOADER_WORKERS>0): identical streams to the
    threaded loader across an epoch boundary (per-sample RNG is keyed on
    (seed, epoch, index), so epoch 2 must also match)."""
    cfg = make_mini_cfg(mini_root, tmp_path)
    ds = build_dataset(cfg, mode="train", is_source=True, epochwise=True)
    a = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)
    g = GrainLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=7)
    for epoch in range(2):
        batches_a = list(iter(a))
        batches_g = list(iter(g))
        assert a.epoch == g.epoch == epoch + 1
        assert len(batches_a) == len(batches_g) > 0
        for ba, bg in zip(batches_a, batches_g):
            np.testing.assert_allclose(ba["img"], bg["img"])
            np.testing.assert_array_equal(ba["label"], bg["label"])
            assert ba["name"] == bg["name"]


def test_grain_workers_pick_up_masks_from_disk(mini_root, tmp_path):
    """Grain worker PROCESSES never see the in-process mask cache; they
    must observe acquisition-round mask updates through the disk protocol
    alone (grain_loader.py module note; reference semantics:
    cityscapes.py:232-234 re-reads the PNG every access)."""
    from halo_tpu.data import DatasetCatalog
    from halo_tpu.data.masks import load_mask_png, save_mask_png

    cfg = make_mini_cfg(mini_root, tmp_path)
    DatasetCatalog.init_mask(cfg)
    ds = build_dataset(cfg, mode="train", is_source=False, epochwise=True)
    g = GrainLoader(ds, batch_size=1, shuffle=False, num_workers=2, seed=3)

    batch = next(iter(g))
    assert (batch["mask"] == 255).all()  # freshly initialized masks

    # simulate an acquisition round persisting labels for this image —
    # on disk only, exactly what another host's round would leave behind
    mask_path = batch["path_to_mask"][0]
    mask = np.array(load_mask_png(mask_path))
    mask[:4, :4] = 3
    save_mask_png(mask, mask_path)

    g.set_epoch(0)  # fresh pass over the same samples
    batch2 = next(iter(g))
    got = batch2["origin_mask"][0]
    assert (got[:4, :4] == 3).all()
    assert (batch2["mask"] != 255).any()
