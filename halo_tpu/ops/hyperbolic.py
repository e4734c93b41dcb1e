"""Poincare-ball hyperbolic geometry, pure JAX.

TPU-native re-implementation of the reference's hyperbolic layer stack
(reference: core/utils/hyperbolic.py:16-188, which delegates to
geoopt.manifolds.stereographic.math). Everything here is functional,
jit-friendly, and dtype-polymorphic:

  * the reference computes the head in float64 (core/models/classifier.py:553-554);
    TPU f64 is emulated and slow, so the production path runs float32 with
    f32 accumulation. Tests validate the f32 TPU path against an x64 CPU
    golden path (tests/test_hyperbolic.py).
  * all reductions take an ``axis`` argument; feature maps are NHWC on TPU so
    the channel axis is -1 (the reference is NCHW / axis=1).

Curvature convention: ``c > 0`` is the ball curvature magnitude, i.e. the
manifold is the Poincare ball of radius 1/sqrt(c) (geoopt's ``k = -c``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# Projection epsilon of the reference head (core/utils/hyperbolic.py:13).
PROJ_EPS = 1e-3
# Ball-boundary epsilon used by geoopt.project for float64 inputs; the
# reference always casts to double before projecting, so this is the value
# that shapes reference behavior regardless of our compute dtype.
BALL_EPS = 1e-5
_MIN_NORM = 1e-15


def _safe_norm(x, axis=-1, keepdims=True):
    """L2 norm, clamped away from zero (geoopt clamps at 1e-15)."""
    # jnp.linalg.norm has a non-differentiable 0; build from square-sum.
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, _MIN_NORM * _MIN_NORM))


def artanh(x, eps=None):
    """atanh with the input clamped inside (-1, 1) like geoopt."""
    if eps is None:
        eps = 1e-7 if x.dtype == jnp.float32 else 1e-15
    x = jnp.clip(x, -1 + eps, 1 - eps)
    return jnp.arctanh(x)


def project(x, c=1.0, axis=-1, eps=BALL_EPS):
    """Clip points to the open ball of radius (1-eps)/sqrt(c).

    Matches geoopt.project with k=-c (reference: HyperMapper.expmap applies
    this after expmap0, core/utils/hyperbolic.py:38).
    """
    sqrt_c = math.sqrt(c)
    norm = _safe_norm(x, axis=axis)
    maxnorm = (1.0 - eps) / sqrt_c
    cond = norm > maxnorm
    projected = x / norm * maxnorm
    return jnp.where(cond, projected, x)


def expmap0(u, c=1.0, axis=-1):
    """Exponential map at the origin: tanh(sqrt(c)|u|) * u / (sqrt(c)|u|)."""
    sqrt_c = math.sqrt(c)
    norm = _safe_norm(u, axis=axis)
    gamma = jnp.tanh(sqrt_c * norm) / (sqrt_c * norm)
    return gamma * u


def expmap(u, c=1.0, axis=-1, eps=BALL_EPS):
    """expmap0 followed by ball projection (HyperMapper.expmap semantics)."""
    return project(expmap0(u, c=c, axis=axis), c=c, axis=axis, eps=eps)


def logmap0(y, c=1.0, axis=-1):
    """Logarithm map at the origin: artanh(sqrt(c)|y|) * y / (sqrt(c)|y|)."""
    sqrt_c = math.sqrt(c)
    norm = _safe_norm(y, axis=axis)
    return artanh(sqrt_c * norm) * y / (sqrt_c * norm)


def dist0(x, c=1.0, axis=-1, keepdims=False):
    """Poincare distance to the origin: 2/sqrt(c) * artanh(sqrt(c)|x|).

    This is the per-pixel "hyperbolic radius" HALO uses as its acquisition
    signal (reference: HyperMapper.poincare_distance_origin,
    core/utils/hyperbolic.py:74-83; used with purity type 'radius' in
    core/active/floating_region.py:187-193).
    """
    sqrt_c = math.sqrt(c)
    norm = _safe_norm(x, axis=axis, keepdims=keepdims)
    return 2.0 / sqrt_c * artanh(sqrt_c * norm)


def mobius_add(x, y, c=1.0, axis=-1):
    """Mobius addition x (+)_c y on the Poincare ball."""
    x2 = jnp.sum(x * x, axis=axis, keepdims=True)
    y2 = jnp.sum(y * y, axis=axis, keepdims=True)
    xy = jnp.sum(x * y, axis=axis, keepdims=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    denom = 1 + 2 * c * xy + c * c * x2 * y2
    return num / jnp.maximum(denom, _MIN_NORM)


def dist(x, y, c=1.0, axis=-1, keepdims=False):
    """Poincare distance between x and y: 2/sqrt(c) artanh(sqrt(c)|(-x)+y|)."""
    sqrt_c = math.sqrt(c)
    diff_norm = _safe_norm(mobius_add(-x, y, c=c, axis=axis), axis=axis,
                           keepdims=keepdims)
    return 2.0 / sqrt_c * artanh(sqrt_c * diff_norm)


def cosine_distance(x, y, axis=-1):
    """2 - 2 cos(x, y) (HyperMapper.cosine_distance, hyperbolic.py:85-97)."""
    xn = x / _safe_norm(x, axis=axis)
    yn = y / _safe_norm(y, axis=axis)
    return 2.0 - 2.0 * jnp.sum(xn * yn, axis=axis)


# ---------------------------------------------------------------------------
# Hyperbolic multinomial logistic regression (Poincare MLR)
# ---------------------------------------------------------------------------

def hyper_mlr_logits(x, p_mlr, a_mlr, c=1.0, precision=None):
    """Poincare-ball MLR logits, computed densely over feature maps.

    TPU-first formulation of the reference's "convolutional" hyperbolic MLR
    (reference: HyperMLR._hyper_logits, core/utils/hyperbolic.py:120-184).
    The reference expresses the per-class cross-correlations as 1x1 convs
    over NCHW maps; on TPU the same contractions are plain channel matmuls
    that map directly onto the MXU, with everything else elementwise (VPU),
    letting XLA fuse the full chain into the two GEMMs.

    Mathematically: for each pixel embedding x in the ball and class k with
    prototype p_k and direction a_k, the Mobius addition (-p_k) (+) x is
    rewritten as alpha*p + beta*x with shared scalar coefficients, its norm
    is projected to the ball, and the logit is
        2/sqrt(c) * |a_k| * asinh( sqrt(c) * <(-p_k)(+)x, a_k/|a_k|> *
                                   lambda_{projected} )

    Args:
      x: (..., C) on-ball embeddings (channel-last).
      p_mlr: (O, C) class prototypes ("P_MLR" in the reference).
      a_mlr: (O, C) class directions ("A_MLR").
      c: curvature magnitude (> 0).
      precision: optional jax.lax.Precision for the contractions.

    Returns:
      (..., O) logits in the input dtype.
    """
    dtype = x.dtype
    cc = jnp.asarray(c, dtype)
    sqrt_c = jnp.sqrt(cc)
    eps = jnp.asarray(1e-12, dtype)

    xx = jnp.sum(x * x, axis=-1, keepdims=True)          # (..., 1)
    pp = jnp.sum(p_mlr * p_mlr, axis=-1)                 # (O,)

    # <x, -p_k>: single (N, C) @ (C, O) contraction -> MXU.
    px = -jnp.matmul(x, p_mlr.T, precision=precision)    # (..., O)

    sqsq = cc * xx * cc * pp                              # (..., O)
    alpha_num = 1 + 2 * cc * px + cc * xx
    beta_num = 1 - cc * pp                                # (O,)
    denom = jnp.maximum(1 + 2 * cc * px + sqsq, eps)
    alpha = alpha_num / denom
    beta = beta_num / denom

    mobaddnorm = alpha * alpha * pp + beta * beta * xx + 2 * alpha * beta * px
    maxnorm = (1.0 - PROJ_EPS) / sqrt_c
    # max BEFORE sqrt: d/dx sqrt(0) is inf and would poison gradients
    sqrtmob = jnp.sqrt(jnp.maximum(mobaddnorm, 1e-24))
    project_normalized = jnp.where(
        sqrtmob > maxnorm, maxnorm / jnp.maximum(sqrtmob, eps), 1.0)
    mobaddnormprojected = jnp.where(
        sqrtmob < maxnorm, mobaddnorm, maxnorm * maxnorm)

    a_norm = jnp.sqrt(jnp.maximum(jnp.sum(a_mlr * a_mlr, axis=-1), 0.0))  # (O,)
    normed_a = a_mlr / jnp.maximum(a_norm, 1e-12)[:, None]                # (O, C)

    # <x, a_k/|a_k|>: second MXU contraction.
    xdota = beta * jnp.matmul(x, normed_a.T, precision=precision)
    pdota = alpha * jnp.sum(-p_mlr * normed_a, axis=-1)   # (..., O)
    mobdota = (xdota + pdota) * project_normalized

    lamb_px = 2.0 / jnp.maximum(1 - cc * mobaddnormprojected, eps)
    sineterm = sqrt_c * mobdota * lamb_px
    return (2.0 / sqrt_c) * a_norm * jnp.arcsinh(sineterm)


def embedding_metrics(x, y, c=1.0, axis=-1):
    """Euclidean + hyperbolic comparison metrics for two embedding batches
    (reference: HyperMetrics.compute, core/utils/hyperbolic.py:191-228;
    analysis-only utility, unused by the training path).

    Returns dict with mse, cosine_dist, radius_x/y (ball norms), ang_e
    (degrees between projected embeddings), poincare_dist.
    """
    mse = jnp.mean((x - y) ** 2)
    cos = cosine_distance(x, y, axis=axis)
    x_h = expmap(x, c=c, axis=axis)
    y_h = expmap(y, c=c, axis=axis)
    radius_x = _safe_norm(x_h, axis=axis, keepdims=False)
    radius_y = _safe_norm(y_h, axis=axis, keepdims=False)
    xn = x_h / jnp.expand_dims(radius_x, axis)
    yn = y_h / jnp.expand_dims(radius_y, axis)
    cosang = jnp.clip(jnp.sum(xn * yn, axis=axis), -1.0, 1.0)
    ang_e = jnp.arccos(cosang) * (180.0 / math.pi)
    return {"mse": mse, "cosine_dist": cos, "radius_x": radius_x,
            "radius_y": radius_y, "ang_e": ang_e,
            "poincare_dist": dist(x_h, y_h, c=c, axis=axis)}


def init_mlr_params(key, num_classes, channels, dtype=jnp.float32):
    """Kaiming-uniform init matching torch.nn.init.kaiming_uniform_(a=sqrt(5))
    on an (O, C) matrix: bound = 1/sqrt(fan_in) with fan_in = C
    (reference: core/utils/hyperbolic.py:115-118)."""
    kp, ka = jax.random.split(key)
    bound = 1.0 / math.sqrt(channels)
    shape = (num_classes, channels)
    p = jax.random.uniform(kp, shape, dtype, minval=-bound, maxval=bound)
    a = jax.random.uniform(ka, shape, dtype, minval=-bound, maxval=bound)
    return p, a
