"""CLI plumbing + color palettes (reference: core/utils/misc.py)."""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import cfg as global_cfg


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def parse_args(argv=None, cfg=None, description="HALO-TPU training"):
    """``-cfg PATH [KEY VALUE ...]`` surface
    (reference: parse_args, core/utils/misc.py:137-162)."""
    cfg = cfg if cfg is not None else global_cfg
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("-cfg", "--config-file", default="", metavar="FILE",
                        help="path to config file", type=str)
    parser.add_argument("--proctitle", type=str, default="HALO",
                        help="allow a process to change its title")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="Modify config options using the command-line")
    args = parser.parse_args(argv)

    if args.opts:
        args.opts[-1] = args.opts[-1].strip("\r\n")

    cfg.set_new_allowed(True)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    cfg.merge_from_list(args.opts or [])
    cfg.SAVE_DIR = os.path.join(cfg.OUTPUT_DIR, cfg.NAME)
    print(f"Saving to {cfg.SAVE_DIR}")
    cfg.freeze()
    return args


# ---------------------------------------------------------------------------
# color palettes (reference: misc.py:50-134) — for prediction dumps/viz
# ---------------------------------------------------------------------------

CITYSCAPES_PALETTE = [
    128, 64, 128, 244, 35, 232, 70, 70, 70, 102, 102, 156, 190, 153, 153,
    153, 153, 153, 250, 170, 30, 220, 220, 0, 107, 142, 35, 152, 251, 152,
    70, 130, 180, 220, 20, 60, 255, 0, 0, 0, 0, 142, 0, 0, 70, 0, 60, 100,
    0, 80, 100, 0, 0, 230, 119, 11, 32]
# (sky is the standard Cityscapes 70,130,180; the reference's hardcoded
# list types it as 0,130,180 — misc.py:83-85 — a viz-only delta.)


def _voc_palette(n=256):
    """The reference's bit-shift VOC palette (misc.py:118-134), its
    fallback for any dataset != 'city'."""
    palette = [0] * (n * 3)
    for j in range(n):
        lab, i = j, 0
        while lab > 0:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette


def get_color_palette(npimg, dataset="city"):
    """Map a (H, W) trainid array to a paletted PIL image (reference
    get_color_pallete, misc.py:50-116: 'city' palette, VOC otherwise)."""
    from PIL import Image

    img = Image.fromarray(np.asarray(npimg, np.uint8), mode="P")
    if dataset == "city":
        img.putpalette(CITYSCAPES_PALETTE
                       + [0] * (768 - len(CITYSCAPES_PALETTE)))
    else:
        img.putpalette(_voc_palette())
    return img
