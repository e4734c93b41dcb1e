"""Build the (label_to_file, file_to_label) pickle for SYNTHIA balanced
sampling (reference: datasets/generate_synthia_label_info.py — same scheme
as GTAV but uint16 labels with the semantic id in channel 0).

Usage: python datasets/generate_synthia_label_info.py --root datasets/synthia
"""

import argparse
import os
import pickle
from concurrent.futures import ProcessPoolExecutor

import numpy as np
from PIL import Image

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from halo_tpu.data.datasets import ID_TO_TRAINID_16  # noqa: E402

NUM_CLASSES = 16


def classes_in_file(args):
    root, name = args
    arr = np.asarray(Image.open(os.path.join(root, "GT/LABELS", name)))
    if arr.ndim == 3:  # uint16 RGBA: semantic id lives in channel 0
        arr = arr[..., 0]
    table = np.full(65536, 255, np.int32)
    for k, v in ID_TO_TRAINID_16.items():
        table[k] = v
    ids = np.unique(table[arr.astype(np.int64)])
    return name, [int(c) for c in ids if c < NUM_CLASSES]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets/synthia")
    ap.add_argument("--list", default=None)
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.list:
        with open(args.list) as f:
            names = [line.strip() for line in f if line.strip()]
    else:
        names = sorted(os.listdir(os.path.join(args.root, "GT/LABELS")))

    label_to_file = [[] for _ in range(NUM_CLASSES)]
    file_to_label = {}
    with ProcessPoolExecutor(max_workers=args.workers) as pool:
        for name, classes in pool.map(
                classes_in_file, [(args.root, n) for n in names],
                chunksize=32):
            file_to_label[name] = classes
            for c in classes:
                label_to_file[c].append(name)

    out = args.out or os.path.join(args.root, "synthia_label_info.p")
    with open(out, "wb") as f:
        pickle.dump((label_to_file, file_to_label), f)
    print(f"wrote {out}: {len(names)} files")


if __name__ == "__main__":
    main()
