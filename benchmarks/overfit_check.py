"""End-to-end learning check: overfit the tiny synthetic set and watch
mIoU climb. Not a unit test (a few minutes of real training); run
manually or via the driver to sanity-check the full loop.

Usage: python benchmarks/overfit_check.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pathlib
import sys
import tempfile

import numpy as np
from PIL import Image


def make_dataset(root: pathlib.Path, rng):
    from halo_tpu.data.datasets import ID_TO_TRAINID_19
    cs = root / "cityscapes"
    names = []
    for split in ("train", "val"):
        for i in range(3):
            name = f"city{i}/city{i}_{split}_{i:06d}_leftImg8bit.png"
            stem = name.split("_leftImg8bit")[0]
            img_p = cs / "leftImg8bit" / split / name
            lab_p = cs / "gtFine" / split / f"{stem}_gtFine_labelIds.png"
            img_p.parent.mkdir(parents=True, exist_ok=True)
            lab_p.parent.mkdir(parents=True, exist_ok=True)
            # structured, MIRROR-SYMMETRIC image (eval uses flip-TTA) so
            # labels are learnable from pixels
            ids = np.zeros((64, 128), np.uint8)
            ids[:, :] = 7            # road
            ids[:32, 32:96] = 23     # sky band (centered)
            ids[32:, 32:96] = 26     # car band (centered)
            img = np.stack([ids * 3, 255 - ids * 2, ids], -1).astype(np.uint8)
            img = img + rng.integers(0, 20, img.shape).astype(np.uint8)
            Image.fromarray(img).save(img_p)
            Image.fromarray(ids).save(lab_p)
            if split == "train":
                names.append(name)
    (root / "cityscapes_train_list.txt").write_text("\n".join(names) + "\n")
    (root / "cityscapes_val_list.txt").write_text("\n".join(
        f"city{i}/city{i}_val_{i:06d}_leftImg8bit.png" for i in range(3)))


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    from halo_tpu.config import get_default_cfg
    from halo_tpu.engine import build_learner

    tmp = pathlib.Path(tempfile.mkdtemp())
    make_dataset(tmp / "datasets", np.random.default_rng(0))

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnettiny"
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.DATASETS.SOURCE_TRAIN = "cityscapes_train"
    cfg.DATASETS.TARGET_TRAIN = "cityscapes_train"
    cfg.DATASETS.TEST = "cityscapes_val"
    cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN = (128, 64)
    cfg.INPUT.TARGET_INPUT_SIZE_TRAIN = (128, 64)
    cfg.INPUT.INPUT_SIZE_TEST = (128, 64)
    cfg.TPU.DATASET_DIR = str(tmp / "datasets")
    cfg.SOLVER.NUM_ITER = steps
    cfg.SOLVER.BATCH_SIZE = 3
    cfg.SOLVER.BASE_LR = 0.004  # head group runs at 10x
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DATA_PARALLEL = 1
    cfg.PROTOCOL = "source"
    cfg.OUTPUT_DIR = str(tmp / "out")
    cfg.NAME = "overfit"
    cfg.SAVE_DIR = str(tmp / "out" / "overfit")
    cfg.SEED = 0

    from halo_tpu.data import DatasetCatalog
    DatasetCatalog.init_mask(cfg)  # cityscapes-as-source reads mask PNGs
    learner = build_learner(cfg)
    miou0 = learner.validate(max_batches=3)
    learner.fit(max_steps=steps, val_interval=0)
    miou1 = learner.validate(max_batches=3)
    print(f"mIoU before {miou0:.1f} -> after {miou1:.1f} ({steps} steps)")
    # only 3 of 19 classes exist, so a perfect fit scores 3/19 = 15.8 mIoU
    assert miou1 > 12, "training failed to overfit the synthetic set"
    print("OK: end-to-end learning verified")


if __name__ == "__main__":
    main()
