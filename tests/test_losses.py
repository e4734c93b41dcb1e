"""Loss-layer tests against independent numpy references (torch-semantic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from halo_tpu import losses as L


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def test_cross_entropy_matches_numpy():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 8, 8))
    labels[0, :2] = 255  # ignored
    p = np_softmax(logits.astype(np.float64))
    valid = labels != 255
    nll = -np.log(p.reshape(-1, 5)[np.arange(labels.size),
                                   np.where(valid, labels, 0).ravel()])
    want = nll[valid.ravel()].mean()
    got = float(L.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cross_entropy_all_ignored_is_finite():
    logits = jnp.zeros((1, 4, 4, 3))
    labels = jnp.full((1, 4, 4), 255)
    assert np.isfinite(float(L.cross_entropy_loss(logits, labels)))


def test_negative_learning_loss():
    rng = np.random.default_rng(1)
    p = np_softmax(rng.normal(size=(2, 6, 6, 19)).astype(np.float64) * 3)
    mask = (p < 0.05).astype(np.float64)
    want = (-mask * np.log(1 - p + 1e-6)).sum() / mask.sum()
    got = float(L.negative_learning_loss(jnp.asarray(p, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_semantic_boundary():
    """8-neighbor Laplacian: interior of constant regions is 0, edges fire."""
    labels = np.zeros((1, 8, 8), np.int32)
    labels[0, :, 4:] = 3
    b = np.asarray(L.semantic_boundary(jnp.asarray(labels)))
    # Columns 3 and 4 straddle the boundary.
    assert b[0, 2:6, 3].all() and b[0, 2:6, 4].all()
    assert not b[0, 2:6, 1].any() and not b[0, 2:6, 6].any()
    # zeros padding makes the image border fire when labels are nonzero.
    labels2 = np.full((1, 8, 8), 7, np.int32)
    b2 = np.asarray(L.semantic_boundary(jnp.asarray(labels2)))
    assert b2[0, 0].all() and not b2[0, 3, 3]


def test_local_discrepancy_constant_map_is_zero():
    logits = jnp.ones((1, 8, 8, 19)) * jnp.arange(19)
    d = np.asarray(L.local_discrepancy(logits, "l1"))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_local_discrepancy_l1_numpy_golden():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(1, 6, 7, 4)).astype(np.float64)
    p = np_softmax(logits)
    # replicate-pad 3x3 box mean
    pp = np.pad(p, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    mean = np.zeros_like(p)
    for dy in range(3):
        for dx in range(3):
            mean += pp[:, dy:dy + 6, dx:dx + 7]
    mean /= 9
    want = np.abs(p - mean).sum(-1)
    got = np.asarray(L.local_discrepancy(jnp.asarray(logits, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_local_consistent_loss_runs():
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, 8, 8, 19)), jnp.float32)
    labels = np.zeros((2, 8, 8), np.int32)
    labels[:, :, 4:] = 5
    labels[0, 0, :] = 255
    v = float(L.local_consistent_loss(logits, jnp.asarray(labels)))
    assert np.isfinite(v) and v >= 0


@pytest.mark.parametrize("lt", ["l1", "kl"])
def test_local_discrepancy_types(lt):
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.normal(size=(1, 5, 5, 7)), jnp.float32)
    d = np.asarray(L.local_discrepancy(logits, lt))
    assert d.shape == (1, 5, 5) and np.isfinite(d).all()
