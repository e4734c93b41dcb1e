"""Fused Poincare-radius map kernel (Pallas, TPU) — MEASURED NEGATIVE
RESULT, disabled by default.

On v5e every variant of this kernel (MXU selector-contraction below, a
VPU minor-axis reduce, block sizes 32-256) measured ~4 ms/map vs XLA's
0.333 ms — XLA's own lowering of the batched dist0 chain already runs
at ~101% of the embed-read roofline and Mosaic's gridded DMA pipeline
loses 12x to XLA's fusion here (benchmarks/bench_radius_kernel.py;
scoring.py:USE_PALLAS_RADIUS=False). Kept for the record and the
interpret-mode tests; do not re-enable without beating that number.

The design rationale below predates the measurement and explains what
was tried, not what won.

The 'radius' purity stage (reference: FloatingRegionScore.forward,
core/active/floating_region.py:187-193 -> HyperMapper.poincare_distance_origin,
core/utils/hyperbolic.py:74-83) reduces the (H, W, C) ball embedding to a
per-pixel distance-to-origin map: radius = 2/sqrt(c) * artanh(sqrt(c)*|x|).
At 1024x2048x64 the embedding read (268 MB bf16) is ~75% of the whole
scoring chain's mandatory HBM traffic, so this stage sets the chain's
throughput ceiling. XLA's lowering of the channel square-sum (a reduce
over a 64-wide minor axis) measured ~90% of the read roofline
(benchmarks/bench_radius_variants.py); this kernel recovers the rest by
restructuring the reduction for the MXU:

  * the embedding is viewed as (H*W/128, 128*C) — a free row-major
    reshape, fully lane-aligned (no 64-wide minor axis anywhere);
  * each grid step squares one (Tb, 128*C) block on the VPU (bf16) and
    contracts it with a constant block-diagonal selector S (128C, 128),
    S[j, l] = [j // C == l], on the MXU with f32 accumulation:
    out[r, l] = sum_k sq[r, l*C + k] — i.e. the per-pixel channel
    square-sum lands directly in an (Tb, 128) lane-aligned output tile;
  * the artanh tail runs elementwise on the small f32 output tile, so
    the kernel emits the finished radius map (8.4 MB) and the only
    remaining XLA work is min-max normalization + the score combine.

Numerics: squares are formed in bf16 (inputs are already bf16 on the
production path, TPU.SCORING_DTYPE) and accumulated in f32 on the MXU.
Each term carries at most one bf16 rounding (2^-9 relative) and the 64
roundings are independent, so the square-sum error is ~2^-9/sqrt(64)
~ 2.5e-4 relative — far inside the bf16 scoring envelope pinned by
tests/test_active.py. f32 embeddings keep the XLA path (f32 MXU
throughput would make the kernel compute-bound).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# dist0 clamps (ops/hyperbolic.py): norm >= 1e-15, artanh input <= 1-1e-7.
_MIN_NORM = 1e-15
_ARTANH_EPS = 1e-7  # f32 epsilon; the kernel computes in f32


def _radius_kernel(x_ref, s_ref, out_ref, *, sqrt_c: float):
    sq = x_ref[:] * x_ref[:]                                   # (Tb, 128C) bf16
    ss = jnp.dot(sq, s_ref[:], preferred_element_type=jnp.float32)
    norm = jnp.sqrt(jnp.maximum(ss, _MIN_NORM * _MIN_NORM))    # (Tb, 128) f32
    t = jnp.clip(sqrt_c * norm, None, 1.0 - _ARTANH_EPS)
    # Mosaic has no atanh primitive; atanh(t) = 0.5*log((1+t)/(1-t))
    # (t >= 0 and clipped below 1, so the quotient is finite)
    out_ref[:] = (1.0 / sqrt_c) * jnp.log((1.0 + t) / (1.0 - t))


def supports(embed) -> bool:
    """True when the fused kernel handles this embedding signature."""
    if embed.ndim != 3 or embed.dtype != jnp.bfloat16:
        return False
    h, w, c = embed.shape
    return (h * w) % 128 == 0 and c * 128 <= 16384


def _radius_kernel_3d(x_ref, out_ref, *, sqrt_c: float):
    x = x_ref[:].astype(jnp.float32)                            # (Tb, 128, C)
    ss = jnp.sum(x * x, axis=-1)                                # (Tb, 128)
    norm = jnp.sqrt(jnp.maximum(ss, _MIN_NORM * _MIN_NORM))
    t = jnp.clip(sqrt_c * norm, None, 1.0 - _ARTANH_EPS)
    out_ref[:] = (1.0 / sqrt_c) * jnp.log((1.0 + t) / (1.0 - t))


def _pick_tb(rows: int, block_bytes_per_row: int, start: int = 256) -> int:
    """Largest row-block that divides ``rows`` inside a ~4 MB buffer."""
    tb = start
    while tb > 8 and (rows % tb or tb * block_bytes_per_row
                      > 4 * 1024 * 1024):
        tb //= 2
    if rows % tb:
        tb = math.gcd(rows, tb)
    return tb


@functools.partial(jax.jit,
                   static_argnames=("c", "interpret", "variant", "tb"))
def radius_map(embed, c: float = 1.0, interpret: bool = False,
               variant: str = "mxu", tb: int = 0):
    """Per-pixel Poincare distance-to-origin of an (H, W, C) bf16 map.

    Value-matches ops/hyperbolic.dist0(embed.astype(f32)) up to the
    bf16-square rounding described in the module docstring.

    variant 'mxu': squares contracted with the block-diagonal selector on
    the MXU. variant 'vpu': 3-D (Tb, 128, C) blocks with a minor-axis VPU
    reduce (benchmarks/bench_radius_kernel.py compares them on-chip).
    """
    h, w, ch = embed.shape
    rows = (h * w) // 128
    sqrt_c = math.sqrt(c)

    if variant == "vpu":
        flat = embed.reshape(rows, 128, ch)
        tb = tb or _pick_tb(rows, 128 * ch * 2)
        out = pl.pallas_call(
            functools.partial(_radius_kernel_3d, sqrt_c=sqrt_c),
            grid=(rows // tb,),
            in_specs=[pl.BlockSpec((tb, 128, ch), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tb, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            interpret=interpret,
        )(flat)
        return out.reshape(h, w)

    flat = embed.reshape(rows, 128 * ch)  # free row-major reshape
    tb = tb or _pick_tb(rows, 128 * ch * 2)
    sel = (jax.lax.broadcasted_iota(jnp.int32, (128 * ch, 128), 0) // ch
           == jax.lax.broadcasted_iota(jnp.int32, (128 * ch, 128), 1)
           ).astype(jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_radius_kernel, sqrt_c=sqrt_c),
        grid=(rows // tb,),
        in_specs=[
            pl.BlockSpec((tb, 128 * ch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128 * ch, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
        interpret=interpret,
    )(flat, sel)
    return out.reshape(h, w)
