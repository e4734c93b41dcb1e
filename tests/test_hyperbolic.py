"""Unit + golden tests for the Poincare-ball math core.

Golden values come from an independent float64 numpy implementation of the
published Poincare MLR formulas (Ganea et al. 2018), re-derived here rather
than ported, matching the semantics of the reference head
(reference: core/utils/hyperbolic.py:120-184).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from halo_tpu.ops import hyperbolic as hyp


# ---------------------------------------------------------------------------
# float64 numpy golden implementations (independent of the JAX code path)
# ---------------------------------------------------------------------------

def np_expmap0(u, c=1.0):
    norm = np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-15)
    return np.tanh(np.sqrt(c) * norm) * u / (np.sqrt(c) * norm)


def np_project(x, c=1.0, eps=hyp.BALL_EPS):
    norm = np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-15)
    maxnorm = (1 - eps) / np.sqrt(c)
    return np.where(norm > maxnorm, x / norm * maxnorm, x)


def np_dist0(x, c=1.0):
    norm = np.linalg.norm(x, axis=-1)
    return 2 / np.sqrt(c) * np.arctanh(np.clip(np.sqrt(c) * norm, 0, 1 - 1e-15))


def np_mobius_add(x, y, c=1.0):
    x2 = np.sum(x * x, -1, keepdims=True)
    y2 = np.sum(y * y, -1, keepdims=True)
    xy = np.sum(x * y, -1, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    return num / np.maximum(1 + 2 * c * xy + c ** 2 * x2 * y2, 1e-15)


def np_mlr_naive(x, p, a, c=1.0):
    """Direct per-pixel Poincare MLR via true Mobius addition (float64).

    logit_k = 2/sqrt(c) |a_k| asinh( sqrt(c) <(-p_k)(+)x, a_k/|a_k|>
                                     * 2 / (1 - c |(-p_k)(+)x|^2) )
    with the Mobius sum's norm clipped to the ball of radius
    (1-PROJ_EPS)/sqrt(c) before the inner product, exactly like the
    projection step inside the reference head.
    """
    n, C = x.shape
    O = p.shape[0]
    out = np.zeros((n, O))
    maxnorm = (1 - hyp.PROJ_EPS) / np.sqrt(c)
    for k in range(O):
        madd = np_mobius_add(np.broadcast_to(-p[k], x.shape), x, c)  # (n, C)
        nrm = np.linalg.norm(madd, axis=-1, keepdims=True)
        scale = np.where(nrm > maxnorm, maxnorm / np.maximum(nrm, 1e-12), 1.0)
        madd = madd * scale
        nrm2 = np.sum(madd * madd, -1)
        a_norm = np.linalg.norm(a[k])
        dot = madd @ (a[k] / max(a_norm, 1e-12))
        lam = 2.0 / np.maximum(1 - c * nrm2, 1e-12)
        out[:, k] = 2 / np.sqrt(c) * a_norm * np.arcsinh(np.sqrt(c) * dot * lam)
    return out


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_expmap0_norm_identity():
    """|expmap0(u)| == tanh(|u|) for c=1, and dist0(expmap(u)) == 2|u|."""
    rng = np.random.default_rng(0)
    u = rng.normal(size=(128, 16)).astype(np.float32) * 0.5
    y = np.asarray(hyp.expmap0(jnp.asarray(u)))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1),
        np.tanh(np.linalg.norm(u, axis=-1)), rtol=1e-4)
    # artanh(tanh(.)) round-trips through the near-boundary region where the
    # artanh derivative blows up; 1e-3 relative is the expected f32 envelope.
    d = np.asarray(hyp.dist0(hyp.expmap(jnp.asarray(u))))
    np.testing.assert_allclose(d, 2 * np.linalg.norm(u, axis=-1), rtol=1e-3)


def test_expmap_matches_numpy_golden():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(64, 32)).astype(np.float64) * 3.0  # some near boundary
    got = np.asarray(hyp.expmap(jnp.asarray(u)))
    want = np_project(np_expmap0(u))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_project_clips_boundary():
    x = jnp.array([[0.9999999, 0.0], [0.1, 0.1]], jnp.float32)
    y = np.asarray(hyp.project(x))
    assert np.linalg.norm(y[0]) <= 1 - hyp.BALL_EPS + 1e-7
    np.testing.assert_allclose(y[1], [0.1, 0.1], rtol=1e-7)


def test_dist0_curvature():
    rng = np.random.default_rng(2)
    for c in [0.5, 1.0, 2.0]:
        u = rng.normal(size=(32, 8)) * 0.3
        x = np_project(np_expmap0(u, c), c)
        got = np.asarray(hyp.dist0(jnp.asarray(x), c=c))
        np.testing.assert_allclose(got, np_dist0(x, c), rtol=1e-6)


def test_mobius_add_inverse_and_dist():
    rng = np.random.default_rng(3)
    x = np_project(np_expmap0(rng.normal(size=(16, 8)) * 0.4))
    xj = jnp.asarray(x)
    z = np.asarray(hyp.mobius_add(-xj, xj))
    np.testing.assert_allclose(z, np.zeros_like(z), atol=1e-7)
    d = np.asarray(hyp.dist(xj, xj))
    np.testing.assert_allclose(d, np.zeros_like(d), atol=1e-5)
    # dist(0, x) == dist0(x)
    d0 = np.asarray(hyp.dist(jnp.zeros_like(xj), xj))
    np.testing.assert_allclose(d0, np_dist0(x), rtol=1e-6)


def test_logmap0_inverts_expmap0():
    rng = np.random.default_rng(4)
    u = rng.normal(size=(32, 8)).astype(np.float32) * 0.5
    y = hyp.expmap0(jnp.asarray(u))
    back = np.asarray(hyp.logmap0(y))
    np.testing.assert_allclose(back, u, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("c", [1.0, 0.5])
def test_hyper_mlr_matches_naive_f64(c):
    """The rewritten alpha/beta formulation equals true Mobius-addition MLR."""
    rng = np.random.default_rng(5)
    x = np_project(np_expmap0(rng.normal(size=(256, 24)) * 0.6, c), c)
    p = rng.normal(size=(19, 24)) * 0.2
    a = rng.normal(size=(19, 24)) * 0.5
    want = np_mlr_naive(x, p, a, c)
    got = np.asarray(hyp.hyper_mlr_logits(
        jnp.asarray(x), jnp.asarray(p), jnp.asarray(a), c=c))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_hyper_mlr_f32_close_to_f64():
    """TPU f32 path stays within tolerance of the x64 golden path
    (the main parity risk called out in SURVEY.md section 7)."""
    rng = np.random.default_rng(6)
    x = np_project(np_expmap0(rng.normal(size=(512, 64)) * 0.5))
    p = rng.normal(size=(19, 64)) * 0.1
    a = rng.normal(size=(19, 64)) * 0.5
    want = np_mlr_naive(x, p, a, 1.0)
    got32 = np.asarray(hyp.hyper_mlr_logits(
        jnp.asarray(x, jnp.float32), jnp.asarray(p, jnp.float32),
        jnp.asarray(a, jnp.float32),
        precision=jax.lax.Precision.HIGHEST))
    err = np.abs(got32 - want)
    scale = np.maximum(np.abs(want), 1.0)
    assert np.max(err / scale) < 5e-4, np.max(err / scale)
    # argmax (the prediction) must agree almost everywhere
    agree = (got32.argmax(-1) == want.argmax(-1)).mean()
    assert agree > 0.999


def test_mlr_init_bounds():
    p, a = hyp.init_mlr_params(jax.random.PRNGKey(0), 19, 64)
    bound = 1 / np.sqrt(64)
    assert p.shape == (19, 64) and a.shape == (19, 64)
    assert np.abs(np.asarray(p)).max() <= bound
    assert np.abs(np.asarray(a)).max() <= bound
    assert np.asarray(p).std() > 0.3 * bound  # actually random


def test_embedding_metrics():
    """HyperMetrics-equivalent analysis utility (reference
    hyperbolic.py:191-228): identical inputs give zero distances."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(16, 8)) * 0.4)
    m = hyp.embedding_metrics(x, x)
    np.testing.assert_allclose(float(m["mse"]), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m["cosine_dist"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m["poincare_dist"]), 0.0,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(m["ang_e"]), 0.0, atol=1e-2)
    y = jnp.asarray(rng.normal(size=(16, 8)) * 0.4)
    m2 = hyp.embedding_metrics(x, y)
    assert float(m2["mse"]) > 0
    assert np.asarray(m2["poincare_dist"]).shape == (16,)
