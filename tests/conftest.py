"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the multi-device test strategy in SURVEY.md section 4: CPU JAX with
XLA_FLAGS=--xla_force_host_platform_device_count=8 is the TPU analogue of a
fake communication backend, letting sharding/collective tests run without
real chips. Must be set before the first jax import.
"""

import os

# XLA_FLAGS is read lazily at CPU-backend init, so setting it here (before
# any computation runs) still takes effect even though jax was already
# imported by the interpreter's sitecustomize.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# XLA's CPU collective rendezvous kills the PROCESS (abseil check-fail ->
# SIGABRT) if any participant arrives >40 s after the first. On a 1-core
# host the 8 virtual devices' pre-collective compute runs time-sliced, so
# a heavy program (or a loaded host) trips it spuriously — observed as a
# fatal abort in test_eight_device_spmd while a benchmark shared the host.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=600")
os.environ["XLA_FLAGS"] = flags

# The environment may pre-import jax (site customization) with
# JAX_PLATFORMS pointed at a real accelerator; env vars are too late by
# then, but jax.config updates still work before first backend use. Tests
# must run on CPU: golden tests need true float64, which TPU lacks.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pickle

import numpy as np
import pytest
from PIL import Image

from halo_tpu.config import get_default_cfg
from halo_tpu.data.datasets import ID_TO_TRAINID_19


@pytest.fixture()
def mini_root(tmp_path):
    """Fake cityscapes + gtav trees with 64x32 images."""
    return build_mini_dataset(tmp_path / "datasets")


def build_mini_dataset(root):
    """Build the synthetic mini dataset at ``root`` (also used by the real
    2-process multi-host test's worker subprocesses, which cannot reach
    pytest fixtures)."""
    import pathlib

    root = pathlib.Path(root)
    cs = root / "cityscapes"
    names = []
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for i in range(3):
            name = f"city{i}/city{i}_{split}_{i:06d}_leftImg8bit.png"
            stem = name.split("_leftImg8bit")[0]
            img_p = cs / "leftImg8bit" / split / name
            lab_p = cs / "gtFine" / split / f"{stem}_gtFine_labelIds.png"
            img_p.parent.mkdir(parents=True, exist_ok=True)
            lab_p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(rng.integers(0, 255, (32, 64, 3),
                                         np.uint8).astype(np.uint8)).save(img_p)
            ids = rng.choice(list(ID_TO_TRAINID_19) + [0], (32, 64))
            Image.fromarray(ids.astype(np.uint8)).save(lab_p)
            if split == "train":
                names.append(name)
    (root / "cityscapes_train_list.txt").write_text(
        "\n".join(names) + "\n")
    (root / "cityscapes_val_list.txt").write_text("\n".join(
        f"city{i}/city{i}_val_{i:06d}_leftImg8bit.png" for i in range(3)))

    gtav = root / "gtav"
    gnames = []
    for i in range(4):
        name = f"{i:05d}.png"
        (gtav / "images").mkdir(parents=True, exist_ok=True)
        (gtav / "labels").mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (30, 50, 3),
                                     np.uint8).astype(np.uint8)).save(
            gtav / "images" / name)
        ids = rng.choice(list(ID_TO_TRAINID_19), (30, 50))
        Image.fromarray(ids.astype(np.uint8)).save(gtav / "labels" / name)
        gnames.append(name)
    (root / "gtav_train_list.txt").write_text("\n".join(gnames) + "\n")
    label_to_file = [gnames for _ in range(19)]
    file_to_label = {n: [i % 19] for i, n in enumerate(gnames)}
    with open(gtav / "gtav_label_info.p", "wb") as f:
        pickle.dump((label_to_file, file_to_label), f)
    return root


def add_mixed_size_images(root, size=(40, 72), count=2):
    """Append ``count`` extra 40x72 (HxW) train images to the mini
    cityscapes tree (whose originals are 32x64), making the target set
    mixed-resolution — exercises the active loader's group_by_size
    bucketing (the reference never batches the sweep, so it never faces
    this; core/active/build.py:118-126)."""
    import pathlib

    root = pathlib.Path(root)
    cs = root / "cityscapes"
    rng = np.random.default_rng(7)
    h, w = size
    names = []
    for i in range(3, 3 + count):
        name = f"city{i}/city{i}_train_{i:06d}_leftImg8bit.png"
        stem = name.split("_leftImg8bit")[0]
        img_p = cs / "leftImg8bit" / "train" / name
        lab_p = cs / "gtFine" / "train" / f"{stem}_gtFine_labelIds.png"
        img_p.parent.mkdir(parents=True, exist_ok=True)
        lab_p.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                     np.uint8).astype(np.uint8)).save(img_p)
        ids = rng.choice(list(ID_TO_TRAINID_19) + [0], (h, w))
        Image.fromarray(ids.astype(np.uint8)).save(lab_p)
        names.append(name)
    list_p = root / "cityscapes_train_list.txt"
    list_p.write_text(list_p.read_text() + "\n".join(names) + "\n")
    return names


def add_acdc_dataset(root, size=(32, 64), conditions=("fog", "night")):
    """Synthetic ACDC tree alongside the mini set: the real directory
    layout (rgb_anon/<cond>/<split>/<seq>/... + gt/<cond>/<split>/...,
    `_rgb_anon`/`_gt_labelIds` naming — reference `acdc` branch,
    README.md:104-116) so the Cityscapes->ACDC recipe runs end-to-end."""
    import pathlib

    root = pathlib.Path(root)
    acdc = root / "acdc"
    rng = np.random.default_rng(3)
    h, w = size
    names = {"train": [], "val": []}
    for cond in conditions:
        for split in ("train", "val"):
            for i in range(2):
                seq = f"GOPR000{i}"
                frame = f"{seq}_frame_{i:06d}"
                name = f"{cond}/{seq}/{frame}_rgb_anon.png"
                img_p = acdc / "rgb_anon" / cond / split / seq / \
                    f"{frame}_rgb_anon.png"
                lab_p = acdc / "gt" / cond / split / seq / \
                    f"{frame}_gt_labelIds.png"
                img_p.parent.mkdir(parents=True, exist_ok=True)
                lab_p.parent.mkdir(parents=True, exist_ok=True)
                Image.fromarray(rng.integers(
                    0, 255, (h, w, 3), np.uint8).astype(np.uint8)).save(img_p)
                ids = rng.choice(list(ID_TO_TRAINID_19) + [0], (h, w))
                Image.fromarray(ids.astype(np.uint8)).save(lab_p)
                names[split].append(name)
    (root / "acdc_train_list.txt").write_text(
        "\n".join(names["train"]) + "\n")
    (root / "acdc_val_list.txt").write_text("\n".join(names["val"]) + "\n")
    return names


# ---------------------------------------------------------------------------
# Synthetic domain-shift set for acquisition-quality A/Bs: lives in
# tests/shift_dataset.py (NOT here) so benchmarks/acquisition_quality.py
# can build it in a plain CPU-f32 subprocess without importing this
# module's process-wide x64/XLA_FLAGS side effects. Re-exported for the
# tests that use it.
from tests.shift_dataset import (SHIFT_PRESENT_TRAINIDS,  # noqa: F401,E402
                                 build_shift_dataset)


def make_mini_cfg(root, tmp_path):
    cfg = get_default_cfg()
    cfg.MODEL.WEIGHTS = ""  # no pretrained trunk in the test environment
    cfg.DATASETS.SOURCE_TRAIN = "gtav_train"
    cfg.DATASETS.TARGET_TRAIN = "cityscapes_train"
    cfg.DATASETS.TEST = "cityscapes_val"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (48, 24)
    cfg.INPUT.TARGET_INPUT_SIZE_TRAIN = (48, 24)
    cfg.INPUT.INPUT_SIZE_TEST = (48, 24)
    cfg.SOLVER.NUM_ITER = 4
    cfg.SOLVER.BATCH_SIZE = 2
    cfg.TPU.DATASET_DIR = str(root)
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.NAME = "t"
    cfg.SAVE_DIR = str(tmp_path / "out" / "t")
    cfg.SEED = 1
    return cfg


