"""Region acquisition scoring (impurity x uncertainty), TPU-native.

Re-implements FloatingRegionScore (reference:
core/active/floating_region.py:26-217): region score = purity x uncertainty
over (2r+1)^2 sliding windows, where both factors are box-filtered maps.

TPU-first formulation:
  * maps are channel-last (H, W, C); the box filter is two separable 1-D
    ``lax.reduce_window`` sums (zero padding, matching the reference's
    all-ones convs with padding_mode='zeros'), which XLA lowers to fast
    strided VPU reductions — no im2col, no materialized kernels.
  * the per-window class histogram for impurity is a box filter over the
    one-hot prediction; entropy is then elementwise (VPU).
  * min-max normalization is a global reduction; everything jits into one
    fused program per (H, W, options) signature.

Uncertainty types (reference :70-92, :158-163): 'entropy', 'pixel_entropy',
'oracle_acc', 'none' — plus the reference's dead zeros-branch for
'hyperbolic'/'certainty' (SURVEY.md §7 bug list) reproduced as 'none'.
Purity types (:165-198): 'ripu', 'oracle_ripu', 'hyper', 'radius',
'euc_norm', 'none'.

Why no Pallas kernel here (and no config knob for one): measured on
v5e, this XLA program runs one 1024x2048 map in ~0.98 ms at f32 and
~0.55-0.75 ms with bf16 input maps (TPU.SCORING_DTYPE) — at or near the
HBM-bandwidth roofline for the mandatory tensor reads; XLA fuses
softmax+entropy+dist0 into bandwidth-bound loops already. Round 2
empirically confirmed this by building the fused kernel: a channel-major
Pallas kernel (single VMEM-resident read of the logits tile, log-sum-exp
entropy with 19 exps + 1 log per pixel) measured 1.35 ms/map vs 0.59 ms
for this lax chain on the same inputs — Mosaic's pipelining of the
strided (C, rows, W) blocks lost more than the fusion saved, so the
kernel was dropped. The real lever was input precision (bf16 maps,
~1.6-2x). The custom-kernel budget went to greedy selection instead
(pallas_select.py, ~700x).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import hyperbolic as hyp
from . import pallas_radius

# The fused Pallas radius kernel (pallas_radius.py) is DISABLED by
# default: measured on v5e (benchmarks/bench_radius_kernel.py), XLA's own
# lowering of the batched dist0 chain runs at ~101% of the embed-read
# roofline (0.333 ms/map bf16 @1024x2048x64), while every Pallas variant
# (MXU selector-contraction and VPU minor-axis reduce, block sizes
# 32-256) measured ~4 ms/map — Mosaic's gridded DMA pipeline loses 12x
# to XLA's fusion here. Kept for the record and interpret-mode tests.
USE_PALLAS_RADIUS = False

# The reference hardcodes log(19) for entropy normalization even for
# 16-class SYNTHIA (floating_region.py:74-76,126); a constant factor never
# changes the argmax-based selection, but we reproduce it for map fidelity.
_LOG19 = math.log(19.0)

# jitted spatial_region_score wrappers, keyed by (mesh, axis, options)
_SPATIAL_JIT_CACHE: dict = {}


def box_filter(x, size: int, axes: Tuple[int, int] = (0, 1)):
    """(size x size) sliding-window sum with zero padding, separable.

    Matches the reference's all-ones conv (init_conv_layer,
    floating_region.py:12-19) for odd ``size``.
    """
    assert size % 2 == 1, "error size"
    r = size // 2
    ndim = x.ndim
    win = [1] * ndim
    pad = [(0, 0)] * ndim
    out = x
    for ax in axes:
        w = list(win)
        w[ax] = size
        p = list(pad)
        p[ax] = (r, r)
        out = jax.lax.reduce_window(
            out, jnp.zeros((), out.dtype), jax.lax.add,
            tuple(w), (1,) * ndim, tuple(p))
    return out


def normalize_map(x, eps=0.0):
    """Global min-max normalization (reference: floating_region.py:22-23)."""
    lo = jnp.min(x)
    hi = jnp.max(x)
    return (x - lo) / (hi - lo + eps)


def pixel_entropy(p):
    """Per-pixel predictive entropy / log(19). p: (H, W, C) softmax."""
    return jnp.sum(-p * jnp.log(p + 1e-6), axis=-1) / _LOG19


# The one-pass entropy clamps logits to this symmetric range so that
# exp() can run WITHOUT the usual max-subtraction (which would cost a
# second full read of the logits tensor — see entropy_from_logits).
# exp(+-60) is comfortably inside f32 range even after the channel sum
# and the x*e^x product (19 * 60 * e^60 ~ 1.3e29 << 3.4e38); real
# network logits are O(10), so the clamp never binds in practice.
_ENTROPY_CLAMP = 60.0


def entropy_from_logits(x, precise: bool = False):
    """Predictive-entropy map straight from (H, W, C) logits.

    precise=True reproduces the reference's literal op chain
    (softmax -> -p*log(p+1e-6), floating_region.py:70-76), which XLA
    lowers to TWO full passes over the logits (max+sumexp, then the
    entropy contraction) — this is the golden-comparison path.

    precise=False (production default) uses the shift-free identity
        H = log(s) - t/s,   s = sum_i e^{x_i},  t = sum_i x_i e^{x_i}
    (p_i = e^{x_i}/s  =>  -sum p_i log p_i = log s - t/s), with x
    clamped to +-_ENTROPY_CLAMP so exp() is overflow-safe without
    subtracting the per-pixel max. Both channel sums share one fused
    read, so the (H, W, C) logits cross HBM ONCE — on a 1024x2048x19
    map this deletes an ~80 MB pass from the bandwidth-bound scoring
    chain (benchmarks/README.md stage split). The result differs from
    the precise path only by the reference's +1e-6 log epsilon
    (<~2e-5 absolute, pinned by tests/test_active.py) and is exact
    whenever all logits lie inside the clamp.
    """
    if precise:
        return pixel_entropy(jax.nn.softmax(x, axis=-1))
    x = jnp.clip(x, -_ENTROPY_CLAMP, _ENTROPY_CLAMP)
    e = jnp.exp(x)
    s = jnp.sum(e, axis=-1)
    t = jnp.sum(x * e, axis=-1)
    return (jnp.log(s) - t / s) / _LOG19


def region_uncertainty(x, unc_type: str, size: int,
                       ground_truth: Optional[jnp.ndarray] = None,
                       precise: bool = False):
    """Windowed uncertainty map (H, W) from f32 logits
    (reference :70-92, :158-163)."""
    if unc_type == "pixel_entropy":
        return entropy_from_logits(x, precise)
    if unc_type == "entropy":
        return box_filter(entropy_from_logits(x, precise), size)
    if unc_type == "oracle_acc":
        p = jax.nn.softmax(x, axis=-1)
        pred = jnp.argmax(x, axis=-1)
        gt = jnp.where(ground_truth == 255, pred, ground_truth)
        # one-hot contraction: take_along_axis's minor-axis gather is
        # ~50x slower on TPU (benchmarks/bench_ce.py)
        p_true = jnp.sum(p * jax.nn.one_hot(gt, p.shape[-1], dtype=p.dtype),
                         axis=-1)
        return box_filter(1.0 - p_true, size)
    # 'none' plus the reference's dead 'hyperbolic'/'certainty' options,
    # which fall through to a zeros map (floating_region.py:84-91). The
    # zeros branch is NOT box-filtered in the reference only for 'none';
    # for the dead options it is filtered, but a filtered zeros map is
    # still zeros, so one branch covers all three.
    h, w = x.shape[0], x.shape[1]
    return jnp.zeros((h, w), jnp.float32)


def region_impurity(predict, num_classes: int, size: int):
    """Per-window class-histogram entropy / log(K) and window pixel count
    (reference: compute_region_impurity, floating_region.py:112-121).

    predict: (H, W) int class map.
    Returns (impurity (H, W), count (H, W)).
    """
    one_hot = jax.nn.one_hot(predict, num_classes, dtype=jnp.float32)
    summary = box_filter(one_hot, size)                    # (H, W, K)
    count = jnp.sum(summary, axis=-1, keepdims=True)       # (H, W, 1)
    dist = summary / count
    imp = jnp.sum(-dist * jnp.log(dist + 1e-6), axis=-1) / math.log(
        num_classes)
    return imp, count[..., 0]


def quantize_radius_map(embed, K: int, c: float = 1.0):
    """Quantize the inverted, normalized hyperbolic radius into K bins
    (reference: quantize_uncert_map, floating_region.py:94-110)."""
    eps = 1e-5
    radius = hyp.dist0(embed.astype(jnp.float32), c=c, axis=-1)
    radius = normalize_map(radius)
    inv = 1.0 - radius
    inv = normalize_map(inv)  # no-op after the first normalize, kept for parity
    q = inv * K - 0.5
    q = jnp.clip(q, -0.5 + eps, K - 0.5 - eps)
    return jnp.round(q).astype(jnp.int32)


@partial(jax.jit, static_argnames=("unc_type", "pur_type", "size",
                                   "num_classes", "K", "normalize", "c",
                                   "precise"))
def floating_region_score(logits,
                          embed=None,
                          ground_truth=None,
                          *,
                          unc_type: str = "entropy",
                          pur_type: str = "radius",
                          size: int = 3,
                          num_classes: int = 19,
                          K: int = 100,
                          normalize: bool = True,
                          c: float = 1.0,
                          precise: bool = False):
    """Full region score for one image (reference: forward, :129-217).

    Args:
      logits: (H, W, num_classes) raw logits at native resolution.
      embed: (H, W, C) Poincare embedding (needed for hyper/radius/euc_norm).
      ground_truth: (H, W) int labels (needed for oracle_* types).
      size: region window = 2*RADIUS_K + 1.
      precise: use the reference's literal softmax-entropy op chain
        instead of the one-pass fused formulation (entropy_from_logits);
        value-identical up to the reference's 1e-6 log epsilon.
    Returns:
      (score, impurity, uncertainty), each (H, W) float32.
    """
    x = logits.astype(jnp.float32)

    unc = region_uncertainty(x, unc_type, size, ground_truth, precise)

    # argmax over raw logits == argmax over softmax (strictly monotonic
    # per pixel); skipping the softmax keeps the purity branch a single
    # pass over the logits.
    if pur_type == "ripu":
        predict = jnp.argmax(x, axis=-1)
        imp, count = region_impurity(predict, num_classes, size)
    elif pur_type == "oracle_ripu":
        predict = jnp.where(ground_truth == 255,
                            jnp.argmax(x, axis=-1), ground_truth)
        imp, count = region_impurity(predict, num_classes, size)
    elif pur_type == "hyper":
        predict = quantize_radius_map(embed, K, c)
        imp, count = region_impurity(predict, K, 3)
    elif pur_type == "radius":
        if (USE_PALLAS_RADIUS and not precise and embed is not None
                and pallas_radius.supports(embed)
                and jax.default_backend() == "tpu"):
            # fused square+MXU-contraction+artanh kernel: the embedding
            # (the chain's dominant HBM read) crosses memory exactly once
            # (pallas_radius.py; bf16 TPU path only)
            imp = pallas_radius.radius_map(embed, c=c)
        else:
            imp = hyp.dist0(embed.astype(jnp.float32), c=c, axis=-1)
        count = jnp.ones_like(imp)
    elif pur_type == "euc_norm":
        imp = jnp.linalg.norm(embed.astype(jnp.float32), axis=-1)
        count = jnp.ones_like(imp)
    elif pur_type == "none":
        imp = jnp.zeros(x.shape[:2], jnp.float32)
        count = jnp.ones(x.shape[:2], jnp.float32)
    else:
        raise NotImplementedError(
            f"Error: purity type '{pur_type}' not implemented")

    unc = unc / count

    # Materialize both (H, W) maps exactly once before fan-out: each is
    # consumed by min, max, AND the final combine, and XLA prefers to
    # duplicate a purely-elementwise producer into every consumer — for
    # 'radius' purity that re-reads the 268 MB embedding per consumer
    # (measured +0.19 ms/map at 1024x2048 bf16, benchmarks/README.md).
    # The barrier pins the 8.4 MB map write instead.
    unc = jax.lax.optimization_barrier(unc)
    imp = jax.lax.optimization_barrier(imp)

    if normalize:
        unc = normalize_map(unc)
        imp = normalize_map(imp)

    return imp * unc, imp, unc


def spatial_region_score(logits, embed=None, ground_truth=None, *,
                         mesh, axis: str = "model", **opts):
    """``floating_region_score`` with the map's H axis sharded over a mesh
    axis (default the ``model`` axis sized by ``TPU.SPATIAL_PARALLEL``).

    This is the long-context analogue SURVEY.md §5 names for this CNN
    workload: the "sequence" is the 1024x2048 spatial map, and sharding it
    lets a score map larger than one chip's HBM (or a latency-critical
    single image on an otherwise idle mesh) run across chips. GSPMD
    inserts the one-row halo exchanges the (2r+1)^2 box filters need at
    shard boundaries and an all-reduce for the min-max normalization —
    sums see the same operands in the same order and min/max are
    order-free, so results are bit-identical to the single-device program
    (pinned by tests/test_parallel.py).

    The shipped recipes keep the model axis at 1 (the reference workload
    fits one chip comfortably); this path is opt-in via the mesh shape.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    n = mesh.shape[axis]
    if logits.shape[0] % n:
        raise ValueError(
            f"H={logits.shape[0]} not divisible by mesh axis "
            f"'{axis}' of size {n}")
    sh = NamedSharding(mesh, PartitionSpec(axis))

    def put(x):
        return None if x is None else jax.device_put(jnp.asarray(x), sh)

    # Cache the jitted wrapper per (mesh, axis, options): a fresh
    # jax.jit(partial(...)) per call is a new function identity and
    # would recompile the sharded program every invocation.
    key = (mesh, axis, tuple(sorted(opts.items())))
    fn = _SPATIAL_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(partial(floating_region_score, **opts),
                     out_shardings=(sh, sh, sh))
        _SPATIAL_JIT_CACHE[key] = fn
    return fn(put(logits), put(embed), put(ground_truth))
