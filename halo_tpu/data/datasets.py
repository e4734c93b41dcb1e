"""Dataset classes: Cityscapes (target), GTAV + SYNTHIA (source).

Re-implements the reference data layer (reference:
core/datasets/cityscapes.py:8-288, gtav.py:12-146, synthia.py:12-143)
without torch: samples are dicts of numpy arrays / strings, channel-last.

Key behaviors preserved:
  * id->trainid remaps (19-class GTAV map, 16-class SYNTHIA map).
  * Cityscapes 'train'/'active' mode concatenates label+active-mask into one
    2-channel map so geometric transforms stay aligned (cityscapes.py:261-267)
    — here as a (H, W, 2) numpy label riding through the paired transforms.
  * the active-mask PNG is re-read from disk on EVERY access
    (cityscapes.py:232-234): that lazy re-read is the DDP mask broadcast
    mechanism, preserved for multi-host fidelity.
  * class-balanced source resampling with SUB_EPOCH_SIZE=3000
    inverse-log-frequency sampling over the label-info pickle
    (gtav.py:31-59, synthia.py:32-61), driven by an explicit seed.
  * ``max_iters`` repetition so one "epoch" covers NUM_ITER*BATCH samples
    (build.py:36, cityscapes.py:84-85).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Dict, List

import numpy as np
from PIL import Image, ImageFile

from .masks import load_indicator

ImageFile.LOAD_TRUNCATED_IMAGES = True

# GTAV/Cityscapes 19-class remap (reference: cityscapes.py:141-160).
ID_TO_TRAINID_19 = {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7,
                    21: 8, 22: 9, 23: 10, 24: 11, 25: 12, 26: 13, 27: 14,
                    28: 15, 31: 16, 32: 17, 33: 18}
# SYNTHIA 16-class remap (reference: cityscapes.py:179-196).
ID_TO_TRAINID_16 = {7: 0, 8: 1, 11: 2, 12: 3, 13: 4, 17: 5, 19: 6, 20: 7,
                    21: 8, 23: 9, 24: 10, 25: 11, 26: 12, 28: 13, 32: 14,
                    33: 15}

TRAINID2NAME_19 = {0: "road", 1: "sidewalk", 2: "building", 3: "wall",
                   4: "fence", 5: "pole", 6: "light", 7: "sign",
                   8: "vegetation", 9: "terrain", 10: "sky", 11: "person",
                   12: "rider", 13: "car", 14: "truck", 15: "bus",
                   16: "train", 17: "motocycle", 18: "bicycle"}
TRAINID2NAME_16 = {0: "road", 1: "sidewalk", 2: "building", 3: "wall",
                   4: "fence", 5: "pole", 6: "light", 7: "sign",
                   8: "vegetation", 9: "sky", 10: "person", 11: "rider",
                   12: "car", 13: "bus", 14: "motocycle", 15: "bicycle"}


def remap_labels(label: np.ndarray, num_classes: int,
                 ignore_label: int = 255) -> np.ndarray:
    """Vectorized id->trainid remap via a 256-entry LUT (the reference
    loops over the dict per image, cityscapes.py:254-257)."""
    table = np.full(256, ignore_label, np.uint8)
    mapping = ID_TO_TRAINID_16 if num_classes == 16 else ID_TO_TRAINID_19
    for k, v in mapping.items():
        table[k] = v
    return table[label]


def _repeat_to(lst, max_iters):
    if max_iters is None or not lst:
        return lst
    return lst * int(np.ceil(float(max_iters) / len(lst)))


def balanced_file_list(label_to_file, file_to_label, num_classes, max_iters,
                       seed=0, sub_epoch_size=3000):
    """Inverse-log-frequency class-balanced resampling
    (reference: gtav.py:31-59). Explicit RNG instead of the global
    np.random state."""
    rng = np.random.RandomState(seed)
    label_to_file = [list(v) for v in label_to_file]
    ind = {i: 0 for i in range(num_classes)}
    # Classes with no files are excluded from the draw, and the wrap is
    # modulo len rather than the reference's len-1 — gtav.py:50-52 raises
    # ZeroDivisionError for a single-file class and IndexError for an
    # empty one (SURVEY.md §7-style bug, not reproduced; the sampling
    # stream already differs because we use an explicit seeded RNG).
    has_files = np.array([len(v) > 0 for v in label_to_file], bool)
    if not has_files.any():
        raise ValueError("label-info has no files for any class")
    tmp_list = []
    for _e in range(int(max_iters / sub_epoch_size) + 1):
        cur_class_dist = np.zeros(num_classes)
        for _i in range(sub_epoch_size):
            if cur_class_dist.sum() == 0:
                dist1 = cur_class_dist.copy()
            else:
                dist1 = cur_class_dist / cur_class_dist.sum()
            w = 1.0 / np.log(1 + 1e-2 + dist1)
            w = np.where(has_files, w, 0.0)
            w = w / w.sum()
            c = rng.choice(num_classes, p=w)
            if ind[c] > (len(label_to_file[c]) - 1):
                rng.shuffle(label_to_file[c])
                ind[c] = ind[c] % len(label_to_file[c])
            c_file = label_to_file[c][ind[c]]
            tmp_list.append(c_file)
            ind[c] += 1
            cur_class_dist[file_to_label[c_file]] += 1
    return tmp_list


class _SourceDataset:
    """Shared GTAV/SYNTHIA behavior (reference: gtav.py / synthia.py)."""

    label_subdir = "labels"

    def __init__(self, data_root, data_list, max_iters=None, num_classes=19,
                 split="train", transform=None, ignore_label=255, debug=False,
                 seed=0):
        self.split = split
        self.num_classes = num_classes
        self.data_root = data_root
        self.transform = transform
        self.ignore_label = ignore_label
        self.debug = debug

        with open(data_list) as handle:
            img_ids = [line.strip() for line in handle if line.strip()]

        if max_iters is not None:
            # Precomputed class-frequency tables. Looked up next to the
            # data first, then next to the list file, then the copies
            # committed under <repo>/datasets/ (the reference ships the
            # same pickles there, datasets/gtav_label_info.p) so a fresh
            # checkout works before any data is staged.
            candidates = [
                osp.join(data_root, self.label_info_name),
                osp.join(osp.dirname(osp.abspath(data_list)),
                         self.label_info_name),
                osp.join(osp.dirname(osp.dirname(osp.dirname(
                    osp.abspath(__file__)))), "datasets",
                    self.label_info_name),
            ]
            info_path = next((c for c in candidates if osp.exists(c)),
                             candidates[0])
            label_to_file, file_to_label = pickle.load(open(info_path, "rb"))
            img_ids = balanced_file_list(
                label_to_file, file_to_label, num_classes, max_iters,
                seed=seed)

        self.data_list: List[Dict] = [
            {"img": os.path.join(data_root, "images", name),
             "label": os.path.join(data_root, self.label_subdir, name),
             "name": name}
            for name in img_ids
        ]
        if max_iters is not None:
            self.data_list = _repeat_to(self.data_list, max_iters)

    def __len__(self):
        return len(self.data_list)

    def _read_label(self, path) -> np.ndarray:
        return np.asarray(Image.open(path), dtype=np.uint8)

    def __getitem__(self, index, rng=None):
        if self.debug:
            index = 0
        files = self.data_list[index]
        image = Image.open(files["img"]).convert("RGB")
        label = remap_labels(self._read_label(files["label"]),
                             self.num_classes, self.ignore_label)
        label = Image.fromarray(label)
        if self.transform is not None:
            image, label = self.transform(image, label, rng)
        return {"img": image, "label": label, "index": index,
                "name": files["name"]}


class GTAVDataSet(_SourceDataset):
    label_info_name = "gtav_label_info.p"


class SynthiaDataSet(_SourceDataset):
    """SYNTHIA: uint16 label PNGs; semantic id lives in channel 0
    (reference: synthia.py:124 via imageio PNG-FI)."""

    label_info_name = "synthia_label_info.p"
    label_subdir = "GT/LABELS"

    def _read_label(self, path) -> np.ndarray:
        arr = np.asarray(Image.open(path))
        if arr.ndim == 3:  # RGBA/RGB uint16 encoding: id in channel 0
            arr = arr[..., 0]
        return arr.astype(np.uint8)


class CityscapesDataSet:
    """Cityscapes target set with the active-mask protocol
    (reference: cityscapes.py:8-288)."""

    def __init__(self, data_root, data_list, save_dir, max_iters=None,
                 num_classes=19, split="train", transform=None,
                 ignore_label=255, debug=False, empty=False,
                 load_mask=True):
        self.active = split == "active"
        if split == "active":
            split = "train"
        self.split = split
        self.num_classes = num_classes
        self.data_root = data_root
        self.save_dir = save_dir
        self.transform = transform
        self.ignore_label = ignore_label
        self.debug = debug
        # load_mask=False: source usage (full GT supervision) — the
        # active-mask store doesn't exist and must not be read
        self.load_mask = load_mask

        self.data_list: List[Dict] = []
        if empty:
            self.data_list.append({"img": "", "label": "", "label_mask": "",
                                   "indicator": "", "name": ""})
        else:
            with open(data_list) as handle:
                names = [line.strip() for line in handle if line.strip()]
            for name in names:
                stem = name.split("_leftImg8bit")[0]
                self.data_list.append({
                    "img": os.path.join(
                        data_root, f"leftImg8bit/{self.split}/{name}"),
                    "label": os.path.join(
                        data_root,
                        f"gtFine/{self.split}/{stem}_gtFine_labelIds.png"),
                    "label_mask": os.path.join(
                        save_dir,
                        f"gtMask/{self.split}/{stem}_gtFine_labelIds.png"),
                    "indicator": os.path.join(
                        save_dir, f"gtIndicator/train/{stem}_indicator.pth"),
                    "name": name,
                })
        self.data_list = _repeat_to(self.data_list, max_iters)

    def __len__(self):
        return len(self.data_list)

    def native_size(self, index) -> tuple:
        """Native (H, W) of sample ``index``, from the PNG header only (no
        pixel decode — PIL reads dimensions lazily). Cached per path. Lets
        the active DataLoader group batches by resolution so mixed-size
        target sets work at TPU.ACTIVE_BATCH > 1 (the reference sidesteps
        this by sweeping at batch 1, core/active/build.py:118-126)."""
        path = self.data_list[index]["img"]
        cache = getattr(self, "_size_cache", None)
        if cache is None:
            cache = self._size_cache = {}
        if path not in cache:
            with Image.open(path) as im:
                w, h = im.size
            cache[path] = (h, w)
        return cache[path]

    def __getitem__(self, index, rng=None):
        if self.debug:
            index = 0
        files = self.data_list[index]

        image = Image.open(files["img"]).convert("RGB")
        label = np.asarray(Image.open(files["label"]), dtype=np.uint8)
        if self.split == "train" and self.load_mask:
            # Single-host fast path: the acquisition round publishes fresh
            # masks in-process (mask_cache); fall back to the lazy PNG
            # re-read — the reference's mask broadcast channel
            # (cityscapes.py:232-234) and the multi-host path.
            from .mask_cache import get_mask
            label_mask = get_mask(files["label_mask"])
            if label_mask is None:
                label_mask = np.asarray(Image.open(files["label_mask"]),
                                        dtype=np.uint8)
        else:
            label_mask = np.full_like(label, 255)

        origin_mask = label_mask.astype(np.int32)

        active_indicator = np.zeros((1,), bool)
        active_selected = np.zeros((1,), bool)
        if self.active:
            from .mask_cache import get_indicator
            ind = get_indicator(files["indicator"])
            if ind is None:
                ind = load_indicator(files["indicator"])
            active_indicator = ind["active"]
            active_selected = ind["selected"]
            if active_indicator.shape == (1,):  # first-time init
                active_indicator = np.zeros(origin_mask.shape, bool)
                active_selected = np.zeros(origin_mask.shape, bool)

        label = remap_labels(label, self.num_classes, self.ignore_label)
        origin_label = label.astype(np.int32)
        h, w = label.shape

        # Ride label+mask through the transforms as one 2-channel map.
        pair = np.stack([label, label_mask], axis=-1)
        if self.transform is not None:
            image, pair = self.transform(image, pair, rng)
        # Every shipped transform returns the (H', W', 2) map (the
        # resize_label=False eval path passes it through UNCHANGED rather
        # than returning something else).
        label_out, mask_out = pair[..., 0], pair[..., 1]

        return {
            "img": image,
            "label": label_out.astype(np.int32),
            "mask": mask_out.astype(np.int32),
            "name": files["name"],
            "path_to_mask": files["label_mask"],
            "path_to_indicator": files["indicator"],
            "size": np.array([h, w], np.int32),
            "origin_mask": origin_mask,
            "origin_label": origin_label,
            "active": active_indicator,
            "selected": active_selected,
        }
