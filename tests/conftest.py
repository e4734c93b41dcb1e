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
# Synthetic domain-shift set for acquisition-quality A/Bs (HALO vs random
# vs no-annotation at equal budget — the paper's central claim, VERDICT r3
# next-#1). Design: a learnable color->class mapping where two RARE
# classes change appearance between domains (novel target colors a
# source-trained model has never seen), so under a small budget selection
# QUALITY decides how much of the shift gets supervised.

# (raw labelId, source RGB, target RGB); raw ids remap via
# ID_TO_TRAINID_19: 7->road(0), 11->building(2), 17->pole(5),
# 21->vegetation(8), 23->sky(10), 26->car(13), 28->bus(15).
_SHIFT_PALETTE = [
    (7, (100, 100, 100), (100, 100, 100)),    # road      common
    (11, (150, 110, 80), (150, 110, 80)),     # building  common
    (23, (70, 130, 180), (70, 130, 180)),     # sky       common
    (21, (60, 150, 60), (60, 150, 60)),       # vegetation common
    (17, (250, 170, 30), (250, 170, 30)),     # pole      rare, UNshifted
    (26, (200, 30, 30), (160, 40, 220)),      # car       rare, SHIFTED
    (28, (230, 210, 40), (40, 215, 215)),     # bus       rare, SHIFTED
]
SHIFT_PRESENT_TRAINIDS = (0, 2, 5, 8, 10, 13, 15)


def _shift_image(rng, size, domain):
    """One (image, raw-id label) pair: 3 horizontal bands of common
    classes, vegetation blobs, and rectangles of the rare classes
    (car/bus shifted, pole unshifted). Structure sizes are calibrated to
    the models' output stride 8: every rectangle spans >=2 feature cells
    per axis (a 3-px pole is invisible at OS8 — measured 0 IoU for every
    sub-cell structure in the first probe of this set)."""
    h, w = size
    label = np.empty((h, w), np.uint8)
    label[: int(0.25 * h)] = 23                    # sky
    label[int(0.25 * h): int(0.6 * h)] = 11        # building
    label[int(0.6 * h):] = 7                       # road

    def rect(cls, rh, rw):
        y = int(rng.integers(0, h - rh))
        x = int(rng.integers(0, w - rw))
        label[y: y + rh, x: x + rw] = cls

    for _ in range(2):                             # vegetation blobs
        rect(21, int(rng.integers(18, 28)), int(rng.integers(22, 34)))
    for _ in range(2):                             # poles (wide enough
        rect(17, int(rng.integers(20, 30)), 8)     #  to resolve at OS8)
    for cls in (26, 28):                           # shifted rare classes
        for _ in range(int(rng.integers(1, 3))):
            rect(cls, int(rng.integers(16, 22)), int(rng.integers(18, 26)))

    img = np.empty((h, w, 3), np.float32)
    col = 1 if domain == "source" else 2
    for entry in _SHIFT_PALETTE:
        img[label == entry[0]] = entry[col]
    img += rng.normal(0.0, 8.0, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), label


def build_shift_dataset(root, seed=0, n_src=16, n_tgt=12, n_val=6,
                        size=(96, 128)):
    """Write the domain-shift set in the GTAV-source / Cityscapes-target
    on-disk layout (so the real loaders, samplers and mask store run
    unmodified). Returns the dataset root."""
    import pathlib

    root = pathlib.Path(root)
    rng = np.random.default_rng(seed)

    gtav = root / "gtav"
    (gtav / "images").mkdir(parents=True, exist_ok=True)
    (gtav / "labels").mkdir(parents=True, exist_ok=True)
    gnames = []
    for i in range(n_src):
        img, label = _shift_image(rng, size, "source")
        name = f"{i:05d}.png"
        Image.fromarray(img).save(gtav / "images" / name)
        Image.fromarray(label).save(gtav / "labels" / name)
        gnames.append(name)
    (root / "gtav_train_list.txt").write_text("\n".join(gnames) + "\n")
    label_to_file = [[] for _ in range(19)]
    file_to_label = {}
    for i, name in enumerate(gnames):
        lab = np.asarray(Image.open(gtav / "labels" / name))
        tids = sorted({ID_TO_TRAINID_19[v] for v in np.unique(lab)
                       if v in ID_TO_TRAINID_19})
        file_to_label[name] = tids
        for t in tids:
            label_to_file[t].append(name)
    with open(gtav / "gtav_label_info.p", "wb") as f:
        pickle.dump((label_to_file, file_to_label), f)

    cs = root / "cityscapes"
    names = {"train": [], "val": []}
    for split, count in (("train", n_tgt), ("val", n_val)):
        for i in range(count):
            img, label = _shift_image(rng, size, "target")
            name = f"city0/city0_{split}_{i:06d}_leftImg8bit.png"
            stem = name.split("_leftImg8bit")[0]
            img_p = cs / "leftImg8bit" / split / name
            lab_p = cs / "gtFine" / split / f"{stem}_gtFine_labelIds.png"
            img_p.parent.mkdir(parents=True, exist_ok=True)
            lab_p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray(img).save(img_p)
            Image.fromarray(label).save(lab_p)
            names[split].append(name)
    (root / "cityscapes_train_list.txt").write_text(
        "\n".join(names["train"]) + "\n")
    (root / "cityscapes_val_list.txt").write_text(
        "\n".join(names["val"]) + "\n")
    return root


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


