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

Performance design (bandwidth-bound; measured on v5e, stage split in
benchmarks/README.md):
  * one-pass entropy (entropy_from_logits): the (H, W, 19) logits cross
    HBM once — the shift-free log-sum identity replaces the softmax's
    max-subtraction second pass.
  * intermediate (H, W) maps are stored f32; 16-bit storage measured
    no faster and costs pick fidelity (_map_dtype docstring).
  * the production sweep folds the native-res upsample into the score
    stage (fused_upsample_region_score): the ~700 MB/image native
    logits/embedding never materialize.
  * an optimization barrier pins each (H, W) map write so XLA doesn't
    duplicate its producer (which re-reads the 268 MB embedding) into
    every min/max/combine consumer.

Why no Pallas kernel here (and no config knob for one): XLA fuses these
chains into bandwidth-bound loops already. Round 2 empirically confirmed
it twice: a channel-major whole-chain kernel (VMEM-resident logits tile,
log-sum-exp entropy) measured 1.35 ms/map vs 0.59 ms for the lax chain,
and every variant of a fused radius kernel (MXU selector-contraction and
VPU minor-axis reduce, block sizes 32-256) measured ~4 ms/map vs XLA's
0.333 ms — Mosaic's gridded DMA pipelining lost more than the fusion
saved (benchmarks/bench_radius_kernel.py). The custom-kernel budget went
to greedy selection instead (pallas_select.py, ~700x).
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

    Small windows are computed as explicit pad+shift adds — XLA fuses
    the ``size`` shifted reads of the padded map into one
    bandwidth-bound pass per axis, while its reduce_window lowering
    measured ~4x slower on the same maps (~0.15 ms vs ~0.05 ms for the
    3x3 over 1024x2048 f32 on v5e; benchmarks/bench_scoring_harness.py).
    Large windows keep reduce_window, whose sliding accumulator does
    O(1) work per pixel instead of O(size).
    """
    assert size % 2 == 1, "error size"
    r = size // 2
    ndim = x.ndim
    out = x
    if size <= 9:
        for ax in axes:
            pad = [(0, 0)] * ndim
            pad[ax] = (r, r)
            xp = jnp.pad(out, pad)
            n = out.shape[ax]
            acc = jax.lax.slice_in_dim(xp, 0, n, axis=ax)
            for k in range(1, size):
                acc = acc + jax.lax.slice_in_dim(xp, k, k + n, axis=ax)
            out = acc
        return out
    win = [1] * ndim
    pad = [(0, 0)] * ndim
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
    subtracting the per-pixel max. The s and t sums run as ONE variadic
    ``lax.reduce`` so the (H, W, C) logits cross HBM ONCE: two separate
    ``jnp.sum`` calls measure 0.212 ms/map at 1024x2048x19 bf16 on v5e
    (XLA lowers them as two read passes) vs 0.112 ms — the 80 MB read
    floor — for the variadic reduce, with bit-identical output
    (measurements recorded in benchmarks/README.md). The result differs
    from the precise path only by the reference's +1e-6 log epsilon
    (<~2e-5 absolute, pinned by tests/test_active.py) and is exact
    whenever all logits lie inside the clamp.
    """
    if precise:
        return pixel_entropy(jax.nn.softmax(x, axis=-1))
    x = jnp.clip(x, -_ENTROPY_CLAMP, _ENTROPY_CLAMP)
    e = jnp.exp(x)
    zero = jnp.zeros((), x.dtype)
    s, t = jax.lax.reduce((e, x * e), (zero, zero),
                          lambda a, b: (a[0] + b[0], a[1] + b[1]),
                          dimensions=(x.ndim - 1,))
    return (jnp.log(s) - t / s) / _LOG19


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


def _quantize_from_radius(radius, K: int):
    """Quantize an (H, W) radius map into K inverted-normalized bins
    (reference: quantize_uncert_map, floating_region.py:94-110)."""
    eps = 1e-5
    radius = normalize_map(radius)
    inv = 1.0 - radius
    inv = normalize_map(inv)  # no-op after the first normalize, kept for parity
    q = inv * K - 0.5
    q = jnp.clip(q, -0.5 + eps, K - 0.5 - eps)
    return jnp.round(q).astype(jnp.int32)


def quantize_radius_map(embed, K: int, c: float = 1.0):
    """Quantize the inverted, normalized hyperbolic radius into K bins
    (reference: quantize_uncert_map, floating_region.py:94-110)."""
    return _quantize_from_radius(
        hyp.dist0(embed.astype(jnp.float32), c=c, axis=-1), K)


def _radius_map(embed, c: float, precise: bool):
    """Per-pixel Poincare radius from an (H, W, C) embedding."""
    if (USE_PALLAS_RADIUS and not precise and embed is not None
            and pallas_radius.supports(embed)
            and jax.default_backend() == "tpu"):
        return pallas_radius.radius_map(embed, c=c)
    return hyp.dist0(embed.astype(jnp.float32), c=c, axis=-1)


def _map_dtype(x):
    """Storage dtype for the intermediate (H, W) per-pixel maps: f32.

    Measured negative result (v5e, amortized-dispatch timing — queue 6
    executions per host sync so relay jitter cancels): storing the
    intermediate maps in f16 or bf16 does NOT speed up the 1024x2048
    bf16 entropy-x-radius chain (f32 0.623-0.627, f16 0.629-0.630, bf16
    0.629-0.636 ms/map across two idle-chip rounds). The chain's time is
    set by the big-tensor reads plus VPU transcendental work, not by the
    ~50 MB of (H, W) map traffic a 16-bit store would halve. Since bf16
    storage also measurably degrades greedy-pick fidelity (IoU vs the
    f32 chain drops to ~0.71 on edge-heavy embeddings; f16 keeps ~0.95),
    the maps stay f32 — the exact dtype the all-f32 chain uses, keeping
    16-bit-input score maps bit-identical to the pre-refactor chain.
    """
    del x
    return jnp.float32


def _pixel_maps(x, embed, ground_truth, *, unc_type: str, pur_type: str,
                c: float, precise: bool):
    """Per-pixel (H, W) maps the windowed tail consumes — the only stage
    that reads the big (H, W, C) tensors. x: raw logits (any float
    dtype); maps are computed in f32 and stored in _map_dtype(x)."""
    map_dt = _map_dtype(x)
    x32 = x.astype(jnp.float32)
    pix = {}
    if unc_type in ("entropy", "pixel_entropy"):
        pix["pixel_entropy"] = entropy_from_logits(x32, precise).astype(
            map_dt)
    elif unc_type == "oracle_acc":
        p = jax.nn.softmax(x32, axis=-1)
        pred = jnp.argmax(x32, axis=-1)
        gt = jnp.where(ground_truth == 255, pred, ground_truth)
        # one-hot contraction: take_along_axis's minor-axis gather is
        # ~50x slower on TPU (benchmarks/bench_ce.py)
        pix["one_minus_p_true"] = (1.0 - jnp.sum(
            p * jax.nn.one_hot(gt, p.shape[-1], dtype=p.dtype), axis=-1)
        ).astype(map_dt)

    # argmax over raw logits == argmax over softmax (strictly monotonic
    # per pixel); skipping the softmax keeps the purity branch a single
    # pass over the logits.
    if pur_type == "ripu":
        pix["predict"] = jnp.argmax(x32, axis=-1)
    elif pur_type == "oracle_ripu":
        pix["predict"] = jnp.where(ground_truth == 255,
                                   jnp.argmax(x32, axis=-1), ground_truth)
    elif pur_type in ("hyper", "radius"):
        pix["radius"] = _radius_map(embed, c, precise).astype(map_dt)
    elif pur_type == "euc_norm":
        pix["euc_norm"] = jnp.linalg.norm(embed.astype(jnp.float32),
                                          axis=-1).astype(map_dt)
    return pix


def _score_tail(pix, shape, *, unc_type: str, pur_type: str, size: int,
                num_classes: int, K: int, normalize: bool):
    """Windowed uncertainty/impurity + normalize + combine, from per-pixel
    maps (reference: forward, floating_region.py:129-217 after the dense
    softmax/dist0 stages). Shared verbatim by floating_region_score and
    the fused-upsample scorer so both produce bit-identical tails."""
    if unc_type == "pixel_entropy":
        unc = pix["pixel_entropy"]
    elif unc_type == "entropy":
        unc = box_filter(pix["pixel_entropy"], size)
    elif unc_type == "oracle_acc":
        unc = box_filter(pix["one_minus_p_true"], size)
    else:
        # 'none' plus the reference's dead 'hyperbolic'/'certainty'
        # options, which fall through to a zeros map
        # (floating_region.py:84-91); a box-filtered zeros map is still
        # zeros, so one branch covers all three.
        unc = jnp.zeros(shape, jnp.float32)

    if pur_type in ("ripu", "oracle_ripu"):
        imp, count = region_impurity(pix["predict"], num_classes, size)
    elif pur_type == "hyper":
        imp, count = region_impurity(_quantize_from_radius(
            pix["radius"].astype(jnp.float32), K), K, 3)
    elif pur_type == "radius":
        imp = pix["radius"]
        count = None
    elif pur_type == "euc_norm":
        imp = pix["euc_norm"]
        count = None
    elif pur_type == "none":
        imp = jnp.zeros(shape, jnp.float32)
        count = None
    else:
        raise NotImplementedError(
            f"Error: purity type '{pur_type}' not implemented")

    # count is None for the windowless purity types, where the reference
    # divides by an all-ones map (floating_region.py:186-196) — a bit-
    # exact no-op (x / 1.0), skipped so unc can stay in its storage dtype.
    if count is not None:
        unc = unc.astype(jnp.float32) / count

    # Materialize both (H, W) maps exactly once before fan-out: each is
    # consumed by min, max, AND the final combine, and XLA prefers to
    # duplicate a purely-elementwise producer into every consumer — for
    # 'radius' purity that re-reads the 268 MB embedding per consumer
    # (measured +0.19 ms/map at 1024x2048 bf16, benchmarks/README.md).
    # The barrier pins the (storage-dtype) map write instead.
    unc = jax.lax.optimization_barrier(unc)
    imp = jax.lax.optimization_barrier(imp)

    # All normalize/combine math in f32; the upcast fuses into the
    # consuming passes, so bf16-stored maps are read at half traffic.
    unc = unc.astype(jnp.float32)
    imp = imp.astype(jnp.float32)
    if normalize:
        unc = normalize_map(unc)
        imp = normalize_map(imp)

    return imp * unc, imp, unc


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
    pix = _pixel_maps(logits, embed, ground_truth, unc_type=unc_type,
                      pur_type=pur_type, c=c, precise=precise)
    return _score_tail(pix, logits.shape[:2], unc_type=unc_type,
                       pur_type=pur_type, size=size,
                       num_classes=num_classes, K=K, normalize=normalize)


@partial(jax.jit, static_argnames=("native_hw", "score_dtype", "block_rows",
                                   "unc_type", "pur_type", "size",
                                   "num_classes", "K", "normalize", "c",
                                   "precise"))
def fused_upsample_region_score(logits_in, embed_in=None, native_hw=None,
                                ground_truth=None, *,
                                score_dtype=jnp.bfloat16,
                                block_rows: int = 128,
                                unc_type: str = "entropy",
                                pur_type: str = "radius",
                                size: int = 3,
                                num_classes: int = 19,
                                K: int = 100,
                                normalize: bool = True,
                                c: float = 1.0,
                                precise: bool = False):
    """floating_region_score with the native-res upsample FOLDED IN.

    The production sweep (reference: RegionSelection, build.py:122-144)
    upsamples logits and the Poincare embedding to native resolution
    before scoring; materializing those maps costs ~700 MB of HBM
    traffic per 1024x2048 image (the embedding alone is 268 MB bf16)
    that the score never needs again. This variant interpolates row
    BLOCKS — the same two align-corners einsum contractions
    resize_bilinear uses, with the row matrix sliced per block — and
    reduces each block straight to the per-pixel (H, W) maps
    (entropy / radius / argmax), so only ~8 MB/map reaches HBM.

    Per-native-pixel arithmetic matches the materializing path: same
    interpolation matrices and einsum contractions (row-sliced), same
    f32 -> score_dtype cast, same _pixel_maps ops, same _score_tail.
    Score maps agree to f32 ULP (the per-pixel math runs on row blocks
    instead of the full map, so reduction order can differ — observed
    max ~5e-7) and greedy masks match bit-for-bit — pinned by
    tests/test_active.py.

    Args:
      logits_in: (h, w, C) model-output-res logits (model compute dtype).
      embed_in: (h2, w2, E) feature-res embedding, or None.
      native_hw: (H, W) static native size.
      ground_truth: (H, W) int labels at native res (oracle_* types).
    """
    H, W = int(native_hw[0]), int(native_hw[1])
    # blk need not divide H: every consumer slices [r0:r0+blk] statically,
    # which clamps at H, so the tail block is simply shorter. (An exact-
    # divisor search here degenerated to blk=1 for prime H — unrolling H
    # single-row einsum blocks at trace time, minutes of compile through
    # the relay for one odd-sized image.)
    blk = min(block_rows, H)

    from ..ops.resize import _contract_w, _interp_matrix

    def interp_rows(src, r0):
        """Rows [r0, r0+blk) of resize_bilinear(src, (H, W)): the same
        (banded) contractions with the row matrix sliced statically."""
        in_h, in_w = src.shape[0], src.shape[1]
        if (in_h, in_w) == (H, W):
            return src[r0:r0 + blk]
        import numpy as np
        m = _interp_matrix(H, in_h)[r0:r0 + blk]
        nz = np.nonzero(m.any(axis=0))[0]
        i0, i1 = int(nz[0]), int(nz[-1]) + 1   # contiguous input band
        y = jnp.einsum("oh,hwc->owc", jnp.asarray(m[:, i0:i1],
                                                  jnp.float32),
                       src[i0:i1])
        return _contract_w(y, W, in_w, jnp.float32)

    lg32 = logits_in.astype(jnp.float32)
    needs_embed = pur_type in ("hyper", "radius", "euc_norm")
    em32 = (embed_in.astype(jnp.float32)
            if (embed_in is not None and needs_embed) else None)

    def block_fn(r0):
        # f32 interp -> score_dtype: the materializing path's exact cast
        # chain (resize_bilinear(f32).astype(score_dtype)); _pixel_maps
        # upcasts to f32 internally, as floating_region_score does
        lg = interp_rows(lg32, r0).astype(score_dtype)
        em = (interp_rows(em32, r0).astype(score_dtype)
              if em32 is not None else None)
        gt = (ground_truth[r0:r0 + blk]
              if ground_truth is not None else None)
        return _pixel_maps(lg, em, gt, unc_type=unc_type,
                           pur_type=pur_type, c=c, precise=precise)

    # statically unrolled blocks: block row offsets are trace-time
    # constants, so both interpolation contractions stay BANDED (the
    # lax.map formulation forced a dense W contraction per block and
    # measured SLOWER than materializing; benchmarks/README.md)
    blocks = [block_fn(r0) for r0 in range(0, H, blk)]
    pix = {k: jnp.concatenate([b[k] for b in blocks], axis=0)
           for k in blocks[0]}
    return _score_tail(pix, (H, W), unc_type=unc_type, pur_type=pur_type,
                       size=size, num_classes=num_classes, K=K,
                       normalize=normalize)


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
    order-free, so results match the single-device program to f32 ULP
    (the partitioned graph may place FMAs differently; pinned at 1e-6
    by tests/test_parallel.py).

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
