"""Metric tests vs a literal numpy histogram reference
(reference semantics: core/utils/misc.py:20-47, train_learners.py:141-150)."""

import numpy as np
import jax.numpy as jnp

from halo_tpu.utils.metrics import (intersection_and_union,
                                    miou_from_histograms, miou_star)


def np_iu(pred, target, K, ignore=255):
    pred = pred.copy().ravel()
    target = target.ravel()
    pred[target == ignore] = ignore
    inter = pred[pred == target]
    a_i = np.histogram(inter, bins=np.arange(K + 1))[0]
    a_p = np.histogram(pred, bins=np.arange(K + 1))[0]
    a_t = np.histogram(target, bins=np.arange(K + 1))[0]
    return a_i, a_p + a_t - a_i, a_t


def test_intersection_and_union_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 19, size=(4, 33, 47))
    target = rng.integers(0, 19, size=(4, 33, 47))
    target[0, :5] = 255
    i, u, t = intersection_and_union(jnp.asarray(pred), jnp.asarray(target),
                                     19)
    wi, wu, wt = np_iu(pred, target, 19)
    np.testing.assert_array_equal(np.asarray(i), wi)
    np.testing.assert_array_equal(np.asarray(u), wu)
    np.testing.assert_array_equal(np.asarray(t), wt)


def test_perfect_prediction_miou_one():
    rng = np.random.default_rng(1)
    target = rng.integers(0, 5, size=(2, 16, 16))
    i, u, t = intersection_and_union(jnp.asarray(target), jnp.asarray(target),
                                     5)
    miou, macc, aacc, iou_c, acc_c = miou_from_histograms(i, u, t)
    assert float(miou) > 0.999 and float(aacc) > 0.999


def test_miou_star_excludes_wall_fence_pole():
    iou = np.linspace(0.1, 1.0, 16)
    got = float(miou_star(jnp.asarray(iou), excluded=(3, 4, 5)))
    want = np.delete(iou, [3, 4, 5]).mean()
    np.testing.assert_allclose(got, want, rtol=1e-6)
