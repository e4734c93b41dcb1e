"""Data-layer tests on a synthetic on-disk mini-dataset (the reference has
no tests; invariants here encode its documented behaviors —
core/datasets/*.py)."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image

from halo_tpu.config import get_default_cfg
from halo_tpu.data import (DataLoader, DatasetCatalog, build_dataset,
                           build_transform, remap_labels, balanced_file_list,
                           masks)
from halo_tpu.data.datasets import ID_TO_TRAINID_19
from tests.conftest import make_mini_cfg


def test_remap_labels_matches_dict_loop():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 40, (20, 30)).astype(np.uint8)
    got = remap_labels(raw, 19)
    want = np.full_like(raw, 255)
    for k, v in ID_TO_TRAINID_19.items():
        want[raw == k] = v
    np.testing.assert_array_equal(got, want)


def test_balanced_file_list_deterministic():
    files = [f"f{i}.png" for i in range(10)]
    l2f = [files for _ in range(19)]
    f2l = {f: [i % 19] for i, f in enumerate(files)}
    a = balanced_file_list(l2f, f2l, 19, 3000, seed=7)
    b = balanced_file_list(l2f, f2l, 19, 3000, seed=7)
    assert a == b and len(a) >= 3000
    c = balanced_file_list(l2f, f2l, 19, 3000, seed=8)
    assert a != c


def test_masks_roundtrip(tmp_path):
    m = np.random.default_rng(0).integers(0, 255, (16, 24)).astype(np.uint8)
    p = str(tmp_path / "sub" / "m.png")
    masks.save_mask_png(m, p)
    np.testing.assert_array_equal(masks.load_mask_png(p), m)
    ind = {"active": np.zeros((4, 4), bool), "selected": np.ones((4, 4), bool)}
    ip = str(tmp_path / "sub" / "i_indicator.pth")
    masks.save_indicator(ind, ip)
    back = masks.load_indicator(ip)
    np.testing.assert_array_equal(back["selected"], ind["selected"])


def test_init_mask_and_cityscapes_train(mini_root, tmp_path):
    cfg = make_mini_cfg(mini_root, tmp_path)
    DatasetCatalog.init_mask(cfg, workers=2)
    stem = "city0/city0_train_000000"
    assert os.path.exists(os.path.join(
        cfg.SAVE_DIR, f"gtMask/train/{stem}_gtFine_labelIds.png"))

    ds = build_dataset(cfg, mode="train", is_source=False, epochwise=True)
    s = ds[0]
    assert s["img"].shape == (24, 48, 3)  # sizes are (w,h) -> h=24,w=48
    assert s["label"].shape == (24, 48)
    assert s["mask"].shape == (24, 48)
    assert (s["mask"] == 255).all()  # untouched mask
    assert s["origin_label"].shape == (32, 64)
    # labels are remapped into [0,19) U {255}
    u = np.unique(s["label"])
    assert ((u < 19) | (u == 255)).all()


def test_cityscapes_active_mode_native_labels(mini_root, tmp_path):
    cfg = make_mini_cfg(mini_root, tmp_path)
    DatasetCatalog.init_mask(cfg, workers=2)
    ds = build_dataset(cfg, mode="active", is_source=False, epochwise=True)
    s = ds[0]
    # active mode = test transform: image resized, label kept native
    assert s["img"].shape == (24, 48, 3)
    assert s["origin_label"].shape == (32, 64)
    assert s["active"].shape == (32, 64)  # first-time init expands
    assert not s["active"].any()


def test_val_dataset_native_label(mini_root, tmp_path):
    cfg = make_mini_cfg(mini_root, tmp_path)
    ds = build_dataset(cfg, mode="val", is_source=False)
    s = ds[0]
    assert s["img"].shape == (24, 48, 3)
    assert s["label"].shape == (32, 64)  # resize_label=False


def test_source_dataset_and_loader(mini_root, tmp_path):
    cfg = make_mini_cfg(mini_root, tmp_path)
    ds = build_dataset(cfg, mode="train", is_source=True)  # balanced+repeat
    assert len(ds) >= cfg.SOLVER.NUM_ITER * cfg.SOLVER.BATCH_SIZE
    loader = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2, seed=3)
    batch = next(iter(loader))
    assert batch["img"].shape == (2, 24, 48, 3)
    assert batch["label"].shape == (2, 24, 48)
    # determinism across fresh loaders
    loader2 = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                         seed=3)
    batch2 = next(iter(loader2))
    np.testing.assert_allclose(batch["img"], batch2["img"])


def test_random_scale_crop_alignment(mini_root, tmp_path):
    """Label and mask channels must stay geometrically locked through
    RandomScale+RandomCrop (the reason the reference rides them as one
    2-channel image, cityscapes.py:261-267)."""
    cfg = make_mini_cfg(mini_root, tmp_path)
    cfg.INPUT.INPUT_SCALES_TRAIN = (0.8, 1.2)
    DatasetCatalog.init_mask(cfg, workers=2)
    ds = build_dataset(cfg, mode="train", is_source=False, epochwise=True)
    import random as pyrandom
    s = ds.__getitem__(0, rng=pyrandom.Random(5))
    s2 = ds.__getitem__(0, rng=pyrandom.Random(5))
    np.testing.assert_allclose(s["img"], s2["img"])
    np.testing.assert_array_equal(s["label"], s2["label"])
    assert s["img"].shape == (24, 48, 3)


def test_mask_cache_write_through(mini_root, tmp_path):
    """The in-process mask cache serves fresh masks before the async file
    write lands, and falls back to disk on miss."""
    from halo_tpu.data import mask_cache
    from halo_tpu.data.masks import save_mask_png

    mask_cache.clear()
    cfg = make_mini_cfg(mini_root, tmp_path)
    DatasetCatalog.init_mask(cfg, workers=2)
    ds = build_dataset(cfg, mode="train", is_source=False, epochwise=True)
    path = ds.data_list[0]["label_mask"]

    # disk says 255 everywhere
    s0 = ds[0]
    assert (s0["mask"] == 255).all()

    # publish a fresh mask in-process only (no file write)
    fresh = np.full((32, 64), 255, np.uint8)
    fresh[4:7, 8:11] = 3
    mask_cache.put_mask(path, fresh)
    s1 = ds[0]
    assert (s1["origin_mask"] == fresh).all()

    # cache cleared -> falls back to the (unchanged) file
    mask_cache.clear()
    s2 = ds[0]
    assert (s2["mask"] == 255).all()


def test_group_by_size_loader(mini_root, tmp_path):
    """group_by_size buckets an epoch into single-resolution batches with
    exact coverage; trailing partial batches pad within their bucket."""
    from tests.conftest import add_mixed_size_images

    add_mixed_size_images(mini_root)  # 3 imgs @32x64 + 2 @40x72
    cfg = make_mini_cfg(mini_root, tmp_path)
    DatasetCatalog.init_mask(cfg, workers=2)
    ds = build_dataset(cfg, mode="active", is_source=False, epochwise=True)
    assert ds.native_size(0) == (32, 64) and ds.native_size(3) == (40, 72)

    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=2,
                        pad_final=True, group_by_size=True)
    seen = []
    for batch in loader:
        sizes = np.asarray(batch["size"])
        assert (sizes == sizes[0]).all()  # never mixes resolutions
        assert batch["img"].shape[0] == 2
        for b in range(2):
            if not batch["is_pad"][b]:
                seen.append(batch["name"][b])
    # every image exactly once: 2 batches of 32x64 (one padded) + 1 of 40x72
    assert sorted(seen) == sorted(e["name"] for e in ds.data_list)

    # requires a size probe
    with pytest.raises(ValueError):
        DataLoader([1, 2, 3], batch_size=2, group_by_size=True)


def test_collate_ragged_arrays_stay_lists():
    """Mixed-shape array fields (native-res origin_* on a mixed-resolution
    set) collate to lists instead of raising; uniform fields still stack."""
    from halo_tpu.data.loader import default_collate

    a = {"img": np.zeros((4, 6, 3)), "origin_label": np.zeros((10, 20)),
         "name": "a"}
    b = {"img": np.ones((4, 6, 3)), "origin_label": np.zeros((12, 24)),
         "name": "b"}
    out = default_collate([a, b])
    assert out["img"].shape == (2, 4, 6, 3)
    assert isinstance(out["origin_label"], list)
    assert out["origin_label"][1].shape == (12, 24)
    assert out["name"] == ["a", "b"]
