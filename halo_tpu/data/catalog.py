"""Dataset catalog: name -> dataset registry + active-mask initialization.

Mirrors DatasetCatalog (reference: core/datasets/dataset_path_catalog.py:15-121)
with the same registry names and directory layout. The dataset root comes
from cfg.TPU.DATASET_DIR or the HALO_DATASET_DIR environment variable
(the reference hardcodes "datasets", :16).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

from .datasets import CityscapesDataSet, GTAVDataSet, SynthiaDataSet


class DatasetCatalog:
    DATASET_DIR = "datasets"
    DATASETS = {
        "gtav_train": {"data_dir": "gtav", "data_list": "gtav_train_list.txt"},
        "synthia_train": {"data_dir": "synthia",
                          "data_list": "synthia_train_list.txt"},
        "cityscapes_train": {"data_dir": "cityscapes",
                             "data_list": "cityscapes_train_list.txt"},
        "cityscapes_val": {"data_dir": "cityscapes",
                           "data_list": "cityscapes_val_list.txt"},
        # ACDC adverse-condition target (reference `acdc` branch capability)
        "acdc_train": {"data_dir": "acdc", "data_list":
                       "acdc_train_list.txt"},
        "acdc_val": {"data_dir": "acdc", "data_list": "acdc_val_list.txt"},
    }

    @staticmethod
    def dataset_dir(cfg=None) -> str:
        env = os.environ.get("HALO_DATASET_DIR")
        if env:
            return env
        if cfg is not None and hasattr(cfg, "TPU"):
            return cfg.TPU.DATASET_DIR
        return DatasetCatalog.DATASET_DIR

    @staticmethod
    def get(name, mode, num_classes, max_iters=None, transform=None,
            cfg=None, empty=False, seed=0, is_source=False):
        data_dir = DatasetCatalog.dataset_dir(cfg)
        attrs = DatasetCatalog.DATASETS[name] if name in \
            DatasetCatalog.DATASETS else None
        if attrs is None:
            raise RuntimeError(f"Dataset not available: {name}")
        root = os.path.join(data_dir, attrs["data_dir"])
        data_list = os.path.join(data_dir, attrs["data_list"])
        if "gtav" in name:
            return GTAVDataSet(root, data_list, max_iters=max_iters,
                               num_classes=num_classes, split=mode,
                               transform=transform, seed=seed)
        if "synthia" in name:
            return SynthiaDataSet(root, data_list, max_iters=max_iters,
                                  num_classes=num_classes, split=mode,
                                  transform=transform, seed=seed)
        # is_source: the active-mask store is TARGET machinery; a
        # Cityscapes/ACDC set used as the SOURCE (the ACDC recipe trains
        # cityscapes->acdc) reads full GT and must not touch gtMask.
        if "cityscapes" in name:
            return CityscapesDataSet(
                root, data_list, save_dir=cfg.SAVE_DIR, max_iters=max_iters,
                num_classes=num_classes, split=mode, transform=transform,
                empty=empty, load_mask=not is_source)
        if "acdc" in name:
            from .acdc import ACDCDataSet
            return ACDCDataSet(
                root, data_list, save_dir=cfg.SAVE_DIR, max_iters=max_iters,
                num_classes=num_classes, split=mode, transform=transform,
                empty=empty, load_mask=not is_source)
        raise RuntimeError(f"Dataset not available: {name}")

    @staticmethod
    def init_mask(cfg, workers: int = 16):
        """Write 255-filled mask PNGs + scalar indicators for every target
        train image (reference: initMask, dataset_path_catalog.py:69-121;
        joblib parallelism replaced with a thread pool — PIL encode/IO
        release the GIL). Generic over target datasets (cityscapes/acdc):
        paths come from the dataset's own entries instead of a hardcoded
        template."""
        from .masks import init_image_mask

        target = cfg.DATASETS.TARGET_TRAIN or "cityscapes_train"
        ds = DatasetCatalog.get(target, "train",
                                num_classes=cfg.MODEL.NUM_CLASSES, cfg=cfg)

        def one(files):
            init_image_mask(files["img"], files["label_mask"],
                            files["indicator"])

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(one, ds.data_list))

    # reference-compatible alias (dataset_path_catalog.py:69)
    initMask = init_mask
