"""Bilinear resize with align_corners=True semantics, MXU-formulated.

The reference upsamples logits/embeddings everywhere with torch's
``F.interpolate(..., mode='bilinear', align_corners=True)`` (e.g.
core/models/classifier.py:556-557, core/active/build.py:122-135,
core/train_learners.py:86). ``jax.image.resize`` only implements
half-pixel-centers (align_corners=False), so this module builds the exact
align-corners linear operator instead.

TPU-first design: 2-D bilinear interpolation is separable, so the resize is
two dense contractions ``M_h @ X @ M_w^T`` with static interpolation matrices
baked at trace time. Both contractions run on the MXU and are exact linear
algebra (no gathers, which are slow on TPU). For a 640x1280 -> 1024x2048
upsample of a 19-channel map this is ~67 GFLOP of matmul: sub-millisecond on
a v5e chip and usually fused with the surrounding computation by XLA.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp


@lru_cache(maxsize=64)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out, in) align-corners linear interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if in_size == 1 or out_size == 1:
        # align_corners: single input broadcasts; single output samples src 0
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


def resize_bilinear(x, out_hw, dtype=None):
    """Resize NHWC (or HWC / NHW) arrays to ``out_hw`` with align_corners=True.

    Args:
      x: (..., H, W, C) array; resized over the -3/-2 axes.
      out_hw: (out_h, out_w) tuple of Python ints (static).
      dtype: accumulation dtype; defaults to x.dtype (float32 recommended).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    cdtype = dtype or (x.dtype if jnp.issubdtype(x.dtype, jnp.floating)
                       else jnp.float32)
    mh = jnp.asarray(_interp_matrix(out_h, in_h), cdtype)
    mw = jnp.asarray(_interp_matrix(out_w, in_w), cdtype)
    y = x.astype(cdtype)
    y = jnp.einsum("oh,...hwc->...owc", mh, y)
    y = jnp.einsum("pw,...hwc->...hpc", mw, y)
    return y.astype(x.dtype) if dtype is None else y


def resize_nearest(x, out_hw):
    """Nearest-neighbor resize over the -3/-2 axes (labels / masks).

    Matches cv2.INTER_NEAREST coordinate mapping: src = floor(i * in/out).
    """
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = x.shape[-3], x.shape[-2]
    if (in_h, in_w) == (out_h, out_w):
        return x
    rows = jnp.asarray(
        np.minimum((np.arange(out_h) * in_h / out_h).astype(np.int64),
                   in_h - 1))
    cols = jnp.asarray(
        np.minimum((np.arange(out_w) * in_w / out_w).astype(np.int64),
                   in_w - 1))
    return x[..., rows, :, :][..., :, cols, :]
