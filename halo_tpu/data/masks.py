"""Active-mask / indicator store.

The reference persists active-learning state as per-image artifacts under
SAVE_DIR (reference: core/datasets/dataset_path_catalog.py:69-121,
core/active/build.py:162-166):

  * ``gtMask/<split>/<stem>_gtFine_labelIds.png`` — uint8 label mask,
    255-filled until regions are acquired; re-read lazily by every
    dataloader worker (the cross-process mask broadcast).
  * ``gtIndicator/train/<stem>_indicator.pth`` — {'active', 'selected'}
    bool maps (torch.save format).

This module keeps the exact file protocol (PNG + .pth via torch's CPU
serializer when available, .npz fallback) so checkpoints interoperate with
reference runs and a half-done AL run resumes from disk (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image

try:  # torch (CPU) is only used as a serializer for .pth compatibility
    import torch
except Exception:  # pragma: no cover
    torch = None


def mkdir_path(path: str):
    os.makedirs(path, exist_ok=True)


def save_mask_png(mask: np.ndarray, path: str):
    """Atomic write (tmp + rename): training dataloaders re-read these
    PNGs lazily from other threads/processes, and the reference's direct
    save (build.py:162-164) can expose a torn file to a concurrent read —
    the one real race in the mask side-channel (SURVEY.md §5)."""
    mkdir_path(os.path.dirname(path))
    tmp = path + ".tmp"
    Image.fromarray(np.asarray(mask, np.uint8)).save(tmp, format="PNG")
    os.replace(tmp, path)


def load_mask_png(path: str) -> np.ndarray:
    return np.asarray(Image.open(path), dtype=np.uint8)


def save_indicator(indicator: Dict[str, np.ndarray], path: str):
    mkdir_path(os.path.dirname(path))
    if torch is not None and path.endswith(".pth"):
        tmp = path + ".tmp"
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v).copy())
                    for k, v in indicator.items()}, tmp)
        os.replace(tmp, path)
    else:
        # same tmp+rename discipline as the .pth branch: a reader hitting
        # a half-written zip raises BadZipFile — the torn-read race this
        # module exists to close
        npz = path if path.endswith(".npz") else path + ".npz"
        tmp = npz + ".tmp.npz"
        np.savez_compressed(tmp, **indicator)
        os.replace(tmp, npz)


def load_indicator(path: str) -> Dict[str, np.ndarray]:
    if os.path.exists(path) and path.endswith(".pth") and torch is not None:
        blob = torch.load(path, map_location="cpu", weights_only=True)
        return {k: np.asarray(v.numpy()) for k, v in blob.items()}
    npz_path = path if path.endswith(".npz") else path + ".npz"
    if os.path.exists(npz_path):
        with np.load(npz_path) as z:
            return {k: z[k] for k in z.files}
    raise FileNotFoundError(path)


def init_image_mask(image_path: str, mask_path: str, indicator_path: str):
    """Create the 255-filled mask PNG + scalar indicator for one image
    (reference: dataset_path_catalog.py:78-118)."""
    with Image.open(image_path) as img:
        w, h = img.size
    save_mask_png(np.full((h, w), 255, np.uint8), mask_path)
    save_indicator({"active": np.zeros((1,), bool),
                    "selected": np.zeros((1,), bool)}, indicator_path)
