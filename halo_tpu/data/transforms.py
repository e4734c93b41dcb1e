"""Paired image/label transforms (host-side, PIL + numpy).

Re-implements the reference pipeline (reference: core/datasets/transform.py:16-177)
without torch: images stay PIL until the final ToArray, labels ride along as
PIL (paired geometry) or numpy. Outputs are NHWC float32 — the TPU-native
layout — instead of the reference's CHW tensors.

Randomness is explicit: stochastic transforms take a ``random.Random``
stream (the reference uses the global ``random`` module, transform.py:87,125),
so loaders can seed per-epoch/per-worker deterministically.
"""

from __future__ import annotations

import random
from typing import Optional, Sequence, Tuple

import numpy as np
from PIL import Image


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, image, label, rng: Optional[random.Random] = None):
        for t in self.transforms:
            image, label = t(image, label, rng)
        return image, label

    def __repr__(self):
        return self.__class__.__name__ + "(" + ", ".join(
            repr(t) for t in self.transforms) + ")"


class ToArray:
    """PIL image -> (H, W, 3) float32 in [0, 1]; label -> (H, W[, C]) int32.

    Mirrors torchvision to_tensor scaling (reference: transform.py:34-39)
    but keeps channel-last layout.
    """

    def __call__(self, image, label, rng=None):
        img = np.asarray(image, dtype=np.float32) / 255.0
        if img.ndim == 2:
            img = img[..., None]
        lbl = np.asarray(label)
        return img, lbl.astype(np.int32)


class Normalize:
    """Per-channel (x - mean) / std with the optional BGR*255 path
    (reference: transform.py:42-52)."""

    def __init__(self, mean, std, to_bgr255=False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr255 = to_bgr255

    def __call__(self, image, label, rng=None):
        if self.to_bgr255:
            image = image[..., ::-1] * 255.0
        return (image - self.mean) / self.std, label


def _resize_label(label, size_hw):
    """Nearest resize for PIL or numpy labels (multi-channel numpy labels
    go through per-channel PIL NEAREST, matching cv2.INTER_NEAREST)."""
    h, w = size_hw
    if isinstance(label, np.ndarray):
        if label.ndim == 2:
            return np.asarray(Image.fromarray(label).resize(
                (w, h), Image.NEAREST))
        chans = [np.asarray(Image.fromarray(label[..., c]).resize(
            (w, h), Image.NEAREST)) for c in range(label.shape[-1])]
        return np.stack(chans, axis=-1)
    return label.resize((w, h), Image.NEAREST)


class Resize:
    """Bicubic image resize, nearest label resize; ``resize_label=False``
    keeps native-res labels for eval (reference: transform.py:55-70 and
    build_transform's test pipeline, core/datasets/build.py:21-26)."""

    def __init__(self, size: Tuple[int, int], resize_label=True):
        self.size = tuple(size)  # (h, w)
        self.resize_label = resize_label

    def __call__(self, image, label, rng=None):
        h, w = self.size
        image = image.resize((w, h), Image.BICUBIC)
        if self.resize_label:
            label = _resize_label(label, self.size)
        return image, label


class RandomScale:
    """Uniformly scale the (h, w) base size by s ~ U[lo, hi]
    (reference: transform.py:73-95)."""

    def __init__(self, scale: Sequence[float], size=None, resize_label=True):
        self.scale = tuple(scale)
        self.size = size
        self.resize_label = resize_label

    def __call__(self, image, label, rng=None):
        rng = rng or random
        w, h = image.size
        if self.size:
            h, w = self.size
        s = self.scale[0] + (self.scale[1] - self.scale[0]) * rng.random()
        size = (int(h * s), int(w * s))
        image = image.resize((size[1], size[0]), Image.BICUBIC)
        if self.resize_label:
            label = _resize_label(label, size)
        return image, label


class RandomCrop:
    """Random (th, tw) crop with pad-if-needed; labels pad with
    ``label_fill`` (=255 ignore) (reference: transform.py:98-167)."""

    def __init__(self, size: Tuple[int, int], pad_if_needed=True, fill=0,
                 label_fill=255):
        self.size = tuple(size)  # (h, w)
        self.pad_if_needed = pad_if_needed
        self.fill = fill
        self.label_fill = label_fill

    @staticmethod
    def _pad(image, label, pad_lr, pad_tb, fill, label_fill):
        left, right = pad_lr
        top, bottom = pad_tb
        if left == right == top == bottom == 0:
            return image, label
        w, h = image.size
        canvas = Image.new(image.mode, (w + left + right, h + top + bottom),
                           fill)
        canvas.paste(image, (left, top))
        if isinstance(label, np.ndarray):
            pad_spec = [(top, bottom), (left, right)] + [(0, 0)] * (
                label.ndim - 2)
            label = np.pad(label, pad_spec, constant_values=label_fill)
        else:
            lc = Image.new(label.mode, (w + left + right, h + top + bottom),
                           label_fill)
            lc.paste(label, (left, top))
            label = lc
        return canvas, label

    def __call__(self, image, label, rng=None):
        rng = rng or random
        th, tw = self.size
        # Width then height pad. torchvision F.pad with a 2-tuple pads BOTH
        # sides by the given amount, so the reference over-pads
        # symmetrically (transform.py:139-153); reproduced here.
        if self.pad_if_needed and image.size[0] < tw:
            d = tw - image.size[0]
            image, label = self._pad(image, label, (d, d), (0, 0), self.fill,
                                     self.label_fill)
        if self.pad_if_needed and image.size[1] < th:
            d = th - image.size[1]
            image, label = self._pad(image, label, (0, 0), (d, d), self.fill,
                                     self.label_fill)
        w, h = image.size
        i = 0 if h == th else rng.randint(0, h - th)
        j = 0 if w == tw else rng.randint(0, w - tw)
        image = image.crop((j, i, j + tw, i + th))
        if isinstance(label, np.ndarray):
            label = label[i:i + th, j:j + tw]
        else:
            label = label.crop((j, i, j + tw, i + th))
        return image, label


class RandomHorizontalFlip:
    """p=0.5 paired flip (available for recipes; the shipped configs use
    scales==(1,1) so the reference never flips)."""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, image, label, rng=None):
        rng = rng or random
        if rng.random() < self.p:
            image = image.transpose(Image.FLIP_LEFT_RIGHT)
            if isinstance(label, np.ndarray):
                label = label[:, ::-1]
            else:
                label = label.transpose(Image.FLIP_LEFT_RIGHT)
        return image, label
