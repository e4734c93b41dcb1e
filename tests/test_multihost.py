"""Multi-host semantics tests (single-writer gating, loader sharding) and
sharded eval/acquisition equivalence on the virtual 8-device CPU mesh.

The reference gates mask init + selection on rank 0 and shards batches per
DDP rank (reference: core/train_learners.py:292-294,307-326); here the
process-level behavior is faked by monkeypatching halo_tpu.parallel.multihost
(single-process jax cannot spawn real peers) and the device-level sharding
runs for real on the fake 8-device mesh.
"""

import os

import numpy as np
import pytest

from tests.conftest import make_mini_cfg
from tests.test_engine import tiny_cfg
from halo_tpu.data.loader import DataLoader, local_batch_indices
from halo_tpu.engine import build_learner
from halo_tpu.parallel import multihost


# ---------------------------------------------------------------------------
# loader sharding
# ---------------------------------------------------------------------------

def test_local_batch_indices_shard_and_pad():
    batch = [10, 11, 12, 13, 14]  # partial global batch of target size 8
    idxs, pads = local_batch_indices(batch, 8, None, True)
    assert idxs == [10, 11, 12, 13, 14, 14, 14, 14]
    assert pads == [False] * 5 + [True] * 3
    # host 0 and host 1 take contiguous halves
    i0, p0 = local_batch_indices(batch, 8, (0, 2), True)
    i1, p1 = local_batch_indices(batch, 8, (1, 2), True)
    assert i0 == [10, 11, 12, 13] and p0 == [False] * 4
    assert i1 == [14, 14, 14, 14] and p1 == [False, True, True, True]
    assert i0 + i1 == idxs and p0 + p1 == pads


class _IdxDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.asarray([i], np.int32)}


def test_dataloader_shards_reassemble_global_stream():
    """Concatenating the per-host slices reproduces the global batches."""
    ds = _IdxDataset(10)
    full = DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                      pad_final=True)
    parts = [DataLoader(ds, batch_size=4, shuffle=True, seed=3,
                        pad_final=True, shard=(i, 2)) for i in range(2)]
    got_full = list(iter(full))
    got_parts = [list(iter(p)) for p in parts]
    assert len(got_full) == len(got_parts[0]) == len(got_parts[1])
    for bf, b0, b1 in zip(got_full, *got_parts):
        np.testing.assert_array_equal(
            bf["x"], np.concatenate([b0["x"], b1["x"]]))
        np.testing.assert_array_equal(
            bf["is_pad"], np.concatenate([b0["is_pad"], b1["is_pad"]]))


def test_dataloader_shard_requires_even_batches():
    ds = _IdxDataset(10)
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=4, shard=(0, 2))  # no drop_last/pad_final
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=5, shard=(0, 2), drop_last=True)


# ---------------------------------------------------------------------------
# coordinator gating (faked process_index)
# ---------------------------------------------------------------------------

def _fake_host(monkeypatch, index, count):
    monkeypatch.setattr(multihost, "process_index", lambda: index)
    monkeypatch.setattr(multihost, "process_count", lambda: count)
    # sync_hosts would issue a real collective; the ordering contract is
    # not observable single-process, so stub it.
    monkeypatch.setattr(multihost, "sync_hosts", lambda name: None)


def test_noncoordinator_skips_file_writes(monkeypatch, mini_root, tmp_path):
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    learner = build_learner(cfg)
    _fake_host(monkeypatch, 1, 2)
    assert not multihost.is_coordinator()
    learner._append_jsonl({"loss": 1.0})
    assert not os.path.exists(os.path.join(cfg.SAVE_DIR, "metrics.jsonl"))
    learner._save_checkpoint("x.ckpt")
    assert not os.path.exists(os.path.join(cfg.SAVE_DIR, "x.ckpt"))
    # coordinator writes
    _fake_host(monkeypatch, 0, 2)
    learner._save_checkpoint("x.ckpt")
    assert os.path.exists(os.path.join(cfg.SAVE_DIR, "x.ckpt"))


def test_noncoordinator_skips_init_mask(monkeypatch, mini_root, tmp_path):
    """Only the coordinator seeds the 255-masks (reference LOCAL_RANK guard,
    train_learners.py:292-294)."""
    cfg = tiny_cfg(mini_root, tmp_path, "fully_sup")
    _fake_host(monkeypatch, 1, 2)
    cfg.SOLVER.BATCH_SIZE = 2  # global 2, local 1 on the fake 2-host split
    build_learner(cfg)
    assert not os.path.exists(os.path.join(cfg.SAVE_DIR, "gtMask"))
    _fake_host(monkeypatch, 0, 2)
    build_learner(cfg)
    assert os.path.exists(os.path.join(cfg.SAVE_DIR, "gtMask"))


def test_loader_shard_follows_process(monkeypatch):
    _fake_host(monkeypatch, 1, 2)
    assert multihost.loader_shard() == (1, 2)
    _fake_host(monkeypatch, 0, 1)
    assert multihost.loader_shard() is None


# ---------------------------------------------------------------------------
# sharded eval == single-device eval (real 8-device mesh)
# ---------------------------------------------------------------------------

def test_sharded_eval_matches_single_device(mini_root, tmp_path):
    """validate() over the 8-device data mesh (batch sharded, histograms
    reduced in-program) must reproduce the 1-device result exactly —
    the psum replacement for the reference's all_gather metric reduction
    (train_learners.py:130-165)."""
    mious = {}
    for dev in (1, 8):
        cfg = tiny_cfg(mini_root, tmp_path, "test", devices=dev)
        cfg.OUTPUT_DIR = str(tmp_path / f"out_d{dev}")
        cfg.SAVE_DIR = str(tmp_path / f"out_d{dev}" / "t")
        learner = build_learner(cfg)
        mious[dev] = learner.validate()
    assert mious[1] == mious[8]


def test_sharded_sweep_masks_match_single_device(mini_root, tmp_path):
    """The data-sharded acquisition sweep must produce masks bit-identical
    to the single-device sweep at the SAME model state (per-image compute
    is independent; SURVEY §5 scaling lever). Runs region_selection
    directly so DDP-semantic iteration scaling doesn't shift the round."""
    from halo_tpu.active.region_selection import region_selection
    from halo_tpu.data import mask_cache
    from halo_tpu.data.masks import load_mask_png

    masks = {}
    for dev in (1, 4):
        mask_cache.clear()
        cfg = tiny_cfg(mini_root, tmp_path, "source_target", devices=dev)
        cfg.OUTPUT_DIR = str(tmp_path / f"out_sw{dev}")
        cfg.SAVE_DIR = str(tmp_path / f"out_sw{dev}" / "t")
        cfg.SOLVER.BATCH_SIZE = 1
        cfg.TPU.ACTIVE_BATCH = 1  # sweep batch = 1 x devices
        learner = build_learner(cfg)  # same SEED -> identical init params
        stats = region_selection(cfg, learner.model, learner.state,
                                 learner.active_loader, 1,
                                 mesh=learner.mesh)
        assert stats["images"] == 3  # pads discarded (3 images, batch 4)
        got = {}
        mask_dir = os.path.join(cfg.SAVE_DIR, "gtMask/train")
        for root, _dirs, files in os.walk(mask_dir):
            for f in files:
                got[f] = load_mask_png(os.path.join(root, f))
        masks[dev] = got
    assert masks[1].keys() == masks[4].keys() and masks[1]
    for k in masks[1]:
        np.testing.assert_array_equal(masks[1][k], masks[4][k])


def test_any_host_flag_single_process():
    assert multihost.any_host_flag(True) is True
    assert multihost.any_host_flag(False) is False


def test_sum_over_hosts_single_process_identity():
    stats = {"images": 3, "picked": 10, "labeled_px": 90}
    assert multihost.sum_over_hosts(stats) == stats


def test_preempt_flag_agreed_before_checkpoint(monkeypatch, mini_root,
                                               tmp_path):
    """The preemption branch must consult the GLOBAL flag (any_host_flag):
    a process-local check would let one host enter the checkpoint barrier
    while others run the collective train step — a deadlock. We assert
    the fit loop routes through multihost.any_host_flag every step."""
    from tests.test_engine import tiny_cfg
    from halo_tpu.engine import build_learner

    calls = {"n": 0}
    orig = multihost.any_host_flag

    def spy(flag):
        calls["n"] += 1
        return orig(flag)

    monkeypatch.setattr(multihost, "any_host_flag", spy)
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    learner = build_learner(cfg)
    learner.fit(max_steps=2, val_interval=0)
    assert calls["n"] >= 2
