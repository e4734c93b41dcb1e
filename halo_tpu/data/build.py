"""Dataset/transform builders (reference: core/datasets/build.py:5-51)."""

from __future__ import annotations

from . import transforms as T
from .catalog import DatasetCatalog


def build_transform(cfg, mode, is_source):
    """reference: build_transform, core/datasets/build.py:5-27."""
    if mode == "train":
        w, h = (cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN if is_source
                else cfg.INPUT.TARGET_INPUT_SIZE_TRAIN)
        trans_list = [
            T.ToArray(),
            T.Normalize(mean=cfg.INPUT.PIXEL_MEAN, std=cfg.INPUT.PIXEL_STD,
                        to_bgr255=cfg.INPUT.TO_BGR255),
        ]
        scales = cfg.INPUT.INPUT_SCALES_TRAIN
        if scales[0] == scales[1] == 1:
            trans_list = [T.Resize((h, w))] + trans_list
        else:
            trans_list = [T.RandomScale(scale=scales, size=(h, w)),
                          T.RandomCrop(size=(h, w), pad_if_needed=True),
                          ] + trans_list
        return T.Compose(trans_list)

    w, h = cfg.INPUT.INPUT_SIZE_TEST
    return T.Compose([
        T.Resize((h, w), resize_label=False),
        T.ToArray(),
        T.Normalize(mean=cfg.INPUT.PIXEL_MEAN, std=cfg.INPUT.PIXEL_STD,
                    to_bgr255=cfg.INPUT.TO_BGR255),
    ])


def build_dataset(cfg, mode="train", is_source=True, epochwise=False,
                  empty=False):
    """reference: build_dataset, core/datasets/build.py:30-51."""
    assert mode in ("train", "val", "test", "active")
    # NB: mode='active' deliberately gets the TEST transform (native-res
    # labels, no label resize) — reference passes the mode through unchanged
    # and only 'train' hits the train pipeline (build.py:6-27).
    transform = build_transform(cfg, mode, is_source)
    iters = None
    seed = max(int(cfg.SEED), 0)
    if mode in ("train", "active"):
        if not epochwise:
            iters = cfg.SOLVER.NUM_ITER * cfg.SOLVER.BATCH_SIZE
        name = (cfg.DATASETS.SOURCE_TRAIN if is_source
                else cfg.DATASETS.TARGET_TRAIN)
        return DatasetCatalog.get(
            name, mode, num_classes=cfg.MODEL.NUM_CLASSES, max_iters=iters,
            transform=transform, cfg=cfg, empty=empty, seed=seed,
            is_source=is_source)
    if mode == "val":
        return DatasetCatalog.get(
            cfg.DATASETS.TEST, "val", num_classes=cfg.MODEL.NUM_CLASSES,
            transform=transform, cfg=cfg, empty=empty, seed=seed)
    # mode == 'test': reference derives split from the dataset name suffix
    return DatasetCatalog.get(
        cfg.DATASETS.TEST, cfg.DATASETS.TEST.split("_")[-1],
        num_classes=cfg.MODEL.NUM_CLASSES, transform=transform, cfg=cfg,
        empty=empty, seed=seed)
