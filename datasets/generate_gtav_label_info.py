"""Build the (label_to_file, file_to_label) pickle for GTAV balanced
sampling (reference: datasets/generate_gtav_label_info.py:41-89).

Usage: python datasets/generate_gtav_label_info.py --root datasets/gtav \
           [--list datasets/gtav_train_list.txt] [--workers 16]

Scans every label PNG, remaps raw ids -> 19 trainids, and records which
classes appear in which files; the training-time sampler
(halo_tpu/data/datasets.py balanced_file_list) consumes the result.
"""

import argparse
import os
import pickle
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from PIL import Image

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo_tpu.data.datasets import ID_TO_TRAINID_19  # noqa: E402

NUM_CLASSES = 19


def classes_in_file(args):
    root, name = args
    label = np.asarray(Image.open(os.path.join(root, "labels", name)))
    table = np.full(256, 255, np.uint8)
    for k, v in ID_TO_TRAINID_19.items():
        table[k] = v
    ids = np.unique(table[label])
    return name, [int(c) for c in ids if c < NUM_CLASSES]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/gtav")
    ap.add_argument("--list", default=None,
                    help="image list; defaults to all files in labels/")
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.list:
        with open(args.list) as f:
            names = [line.strip() for line in f if line.strip()]
    else:
        names = sorted(os.listdir(os.path.join(args.root, "labels")))

    label_to_file = [[] for _ in range(NUM_CLASSES)]
    file_to_label = {}
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        for name, classes in pool.map(
                classes_in_file, [(args.root, n) for n in names],
                chunksize=32):
            file_to_label[name] = classes
            for c in classes:
                label_to_file[c].append(name)

    out = args.out or os.path.join(args.root, "gtav_label_info.p")
    with open(out, "wb") as f:
        pickle.dump((label_to_file, file_to_label), f)
    print(f"wrote {out}: {len(names)} files")


if __name__ == "__main__":
    main()
