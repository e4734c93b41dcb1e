"""Loss layer: CE(ignore), negative learning, local-consistency.

Functional JAX re-implementations of the reference losses
(reference: core/train_learners.py:45, core/loss/negative_learning_loss.py:6-16,
core/loss/local_consistent_loss.py:5-16, core/loss/boundary.py:6-99).
All operate on NHWC logits / (N,H,W) integer labels, are jit-safe
(masked means instead of boolean indexing), and differentiable where the
reference is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cross_entropy_loss(logits, labels, ignore_index=255, weight=None):
    """Mean CE over non-ignored pixels (torch F.cross_entropy semantics with
    ignore_index; reference: core/train_learners.py:45).

    Args:
      logits: (N, H, W, C) unnormalized scores.
      labels: (N, H, W) int labels in [0, C) or ignore_index.
    """
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # One-hot contraction, NOT take_along_axis: the per-pixel gather
    # along the minor class axis lowers catastrophically on TPU (measured
    # 29.5 ms vs 0.57 ms for this identical-value form at (2,720,1280,19)
    # f32 — benchmarks/bench_ce.py; the gather's scatter transpose taxes
    # the backward the same way).
    one_hot = jax.nn.one_hot(safe_labels, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * one_hot, axis=-1)
    if weight is not None:
        w = one_hot @ jnp.asarray(weight, jnp.float32)
        nll = nll * w
        denom = jnp.sum(jnp.where(valid, w, 0.0))
    else:
        denom = jnp.sum(valid)
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    return total / jnp.maximum(denom, 1.0)


def negative_learning_loss(probs, threshold=0.05):
    """-mean over {p < tau} of log(1 - p + 1e-6)
    (reference: NegativeLearningLoss, core/loss/negative_learning_loss.py:11-16).

    Args:
      probs: (..., C) softmax probabilities.
    """
    p = probs.astype(jnp.float32)
    mask = jax.lax.stop_gradient((p < threshold).astype(jnp.float32))
    item = -mask * jnp.log(1.0 - p + 1e-6)
    return jnp.sum(item) / jnp.maximum(jnp.sum(mask), 1.0)


def _box_mean_3x3(p, neighbor=8):
    """Depthwise 3x3 neighbor mean with replicate padding
    (reference: LocalDiscrepancy.mean_conv, core/loss/boundary.py:63-87).

    Implemented as two separable shift-adds on the VPU rather than a conv:
    replicate-pad then a (1/9) box sum — XLA fuses this into a handful of
    adds, no im2col.
    """
    if neighbor == 8:
        xp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        rows = xp[:, :-2] + xp[:, 1:-1] + xp[:, 2:]
        s = rows[:, :, :-2] + rows[:, :, 1:-1] + rows[:, :, 2:]
        return s / 9.0
    if neighbor == 4:
        xp = jnp.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        s = (xp[:, 1:-1, 1:-1] + xp[:, :-2, 1:-1] + xp[:, 2:, 1:-1]
             + xp[:, 1:-1, :-2] + xp[:, 1:-1, 2:])
        return s / 5.0
    raise NotImplementedError(neighbor)


def local_discrepancy(logits, l_type="l1", neighbor=8):
    """Per-pixel discrepancy between softmax probs and their 3x3 neighbor
    mean (reference: LocalDiscrepancy, core/loss/boundary.py:88-99).

    Returns (N, H, W).
    """
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    mean = _box_mean_3x3(p, neighbor)
    if l_type == "l1":
        return jnp.sum(jnp.abs(p - mean), axis=-1)
    if l_type == "kl":
        return jnp.sum(p * jnp.log(p / (mean + 1e-6) + 1e-6), axis=-1)
    raise NotImplementedError(f"not implemented local soft loss: {l_type}")


def semantic_boundary(labels, neighbor=8):
    """True where the 8-neighbor Laplacian of the label map is nonzero —
    i.e. the pixel touches a different label (reference: DetectSPBoundary
    with zeros padding, core/loss/boundary.py:6-60, 3-D input branch).

    torch casts the float conv output with ``.long()`` (truncation toward
    zero) before the ``!= 0`` test; for integer labels the float conv is
    exact well past 255*8, so an integer shift-add reproduces it bit-for-bit.

    Args:
      labels: (N, H, W) integer label map.
    Returns:
      (N, H, W) bool.
    """
    x = labels.astype(jnp.int32)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="constant")
    if neighbor == 8:
        neigh = (xp[:, :-2, :-2] + xp[:, :-2, 1:-1] + xp[:, :-2, 2:]
                 + xp[:, 1:-1, :-2] + xp[:, 1:-1, 2:]
                 + xp[:, 2:, :-2] + xp[:, 2:, 1:-1] + xp[:, 2:, 2:])
        lap = 8 * x - neigh
    elif neighbor == 4:
        neigh = (xp[:, :-2, 1:-1] + xp[:, 2:, 1:-1]
                 + xp[:, 1:-1, :-2] + xp[:, 1:-1, 2:])
        lap = 4 * x - neigh
    else:
        raise NotImplementedError(neighbor)
    return lap != 0


def local_consistent_loss(logits, labels, l_type="l1", ignore_index=255):
    """Mean local discrepancy over semantic-boundary, non-ignored pixels
    (reference: LocalConsistentLoss, core/loss/local_consistent_loss.py:12-16).
    """
    disc = local_discrepancy(logits, l_type=l_type)
    mask = semantic_boundary(labels) & (labels != ignore_index)
    m = mask.astype(jnp.float32)
    return jnp.sum(disc * m) / jnp.maximum(jnp.sum(m), 1.0)
