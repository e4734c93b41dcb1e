"""VMEM-resident dilated 3x3 conv kernel (Pallas, TPU).

The R101 trunk at output-stride 8 (reference: core/models/resnet.py:168-191
via replace_stride_with_dilation) spends ~half its FLOPs in DENSE stride-1
dilated 3x3 convs (layer3 d=2 x23, layer4 d=4 x3 at 80x160 spatial). XLA's
conv emitter runs the layer3 shape at 163 us vs a 77 us MXU ideal and a
96 us UNdilated-conv comparator — the dilation handling, not the matmul,
is the gap (benchmarks/bench_dilated_conv.py). Two value-identical XLA
reformulations both failed IN CONTEXT for memory-system reasons:

  * shift9 (9 shifted channel GEMMs): wins 1.6x isolated but loses 25%
    in the full trunk — each tap's dot operand re-reads the block input
    from HBM once VMEM no longer holds it (~80 MB/block of re-reads);
  * space-to-batch: exact parity — it keeps the emitter's streaming, so
    it inherits the emitter's in-context behavior.

This kernel targets exactly that: the whole padded input feature map of
one image (7.05 MB bf16 for layer3) is DMA'd into VMEM ONCE (constant-index
block spec, so Mosaic's revolving buffers keep it resident across grid
steps), and the 9 tap GEMMs read it from VMEM at register speed. The grid
walks output row-blocks; each step accumulates the 9 shifted
(RB*W, C) @ (C, Co) products in f32 on the MXU and writes one bf16 output
block.

MEASURED NEGATIVE RESULT (kept opt-in, do not re-default): isolated it
beats the emitter modestly (layer3 d=2: 148 vs 170 us), but in the FULL
R101 trunk at 640x1280 it is 2.3x SLOWER (16.92 vs 7.32 ms/img,
benchmarks/bench_dilated_conv.py `trunk_mode`). Each pallas_call is a
fusion barrier: the preceding BN+ReLU can no longer fuse into the conv's
input read, the padded map is materialized to HBM and DMA'd whole before
the first tap GEMM starts (no pipelining of compute with the 7 MB fill),
and x26 such stalls dwarf the per-conv win. The emitter's dilated conv —
third time measured — is not the in-context bottleneck.

Semantics: stride 1, padding d, dilation d, groups 1 — bit-comparable to
``lax.conv_general_dilated(rhs_dilation=(d, d))`` up to f32-accumulator
ordering (pinned by tests/test_dense_conv.py). The custom VJP mirrors
dense_stencil's (models/layers.py): dx is the SAME operator applied to g
with the flipped, (Cout, Cin)-transposed kernel (margins d*(k-1)-p = d
when p = d, i.e. another pad-d dilation-d conv), and dk is 9 big-K XLA
contractions; residuals are exactly (x, k).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import conv_grads

# Flipped by tests to run the kernel on the CPU interpreter.
INTERPRET = False

# VMEM working-set budget (bytes). The v5e has ~16 MB/core; leave
# headroom for Mosaic's double-buffered output blocks and spills.
_VMEM_BUDGET = 13 * 1024 * 1024


def _vmem_bytes(h, w, c, co, d, rb, itemsize=2) -> int:
    """Working-set estimate: resident padded input + weights + one f32
    accumulator block + double-buffered output blocks. ``itemsize`` is
    the compute dtype's (2 = bf16, the production default; pass 4 for
    f32 or the budget check under-counts 2x and Mosaic fails/spills)."""
    return ((h + 2 * d) * (w + 2 * d) * c * itemsize   # resident input
            + 9 * c * co * itemsize                     # weights
            + rb * w * co * 4                           # f32 accumulator
            + 2 * rb * w * co * itemsize)               # out blocks x2


def _row_block(h: int, w: int, c: int, co: int, d: int,
               itemsize: int = 2) -> int:
    """Largest divisor of ``h`` (<= 32 rows, >= ~1k GEMM rows when
    possible) whose working set fits the VMEM budget."""
    best = 0
    for rb in range(1, min(h, 32) + 1):
        if (h % rb == 0
                and _vmem_bytes(h, w, c, co, d, rb, itemsize)
                <= _VMEM_BUDGET):
            best = rb
    return best if best * w >= 1024 or best == h else 0


def supports(x_shape, k_shape, d: int, itemsize: int = 2) -> bool:
    """Static eligibility: dense 3x3, stride-1/pad-d/dilation-d signature
    with lane-aligned channels and a padded input that fits VMEM at the
    given compute itemsize."""
    if len(x_shape) != 4 or len(k_shape) != 4:
        return False
    b, h, w, c = map(int, x_shape)
    kh, kw, kc, co = map(int, k_shape)
    if (kh, kw) != (3, 3) or kc != c or d < 1:
        return False
    if c % 128 or co % 128 or w % 8:
        return False
    return _row_block(h, w, c, co, d, itemsize) > 0


def _kernel(x_ref, k_ref, o_ref, *, d: int, rb: int, w: int):
    """One (1, RB, W, Co) output block: 9 shifted VMEM GEMMs, f32 acc."""
    r0 = pl.program_id(1) * rb
    c = x_ref.shape[-1]
    co = o_ref.shape[-1]
    acc = None
    for it in range(3):
        for jt in range(3):
            slab = x_ref[0, pl.ds(r0 + it * d, rb), jt * d:jt * d + w, :]
            t = jnp.dot(slab.reshape(rb * w, c), k_ref[it * 3 + jt],
                        preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
    o_ref[0] = acc.reshape(rb, w, co).astype(o_ref.dtype)


def _conv_impl(x, k, d: int):
    b, h, w, c = x.shape
    co = k.shape[-1]
    rb = _row_block(h, w, c, co, d, jnp.dtype(x.dtype).itemsize)
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    k9 = k.reshape(9, c, co).astype(x.dtype)
    grid = (b, h // rb)
    flops = 2 * b * h * w * 9 * c * co
    return pl.pallas_call(
        partial(_kernel, d=d, rb=rb, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h + 2 * d, w + 2 * d, c),
                         lambda bi, i: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c, co), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, w, co), lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * xp.dtype.itemsize
            + k9.size * k9.dtype.itemsize
            + b * h * w * co * x.dtype.itemsize,
            transcendentals=0),
        interpret=INTERPRET,
    )(xp, k9)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def dilated_conv3x3(x, k, d: int):
    """Dense 3x3 conv, stride 1, padding d, dilation d, NHWC/HWIO.

    Value-identical (up to f32 accumulation order) to
    ``lax.conv_general_dilated(x, k, (1, 1), ((d, d), (d, d)),
    rhs_dilation=(d, d))``. Callers must check ``supports()`` first.
    """
    return _conv_impl(x, k, d)


def _vjp_fwd(x, k, d):
    return _conv_impl(x, k, d), (x, k)


def _vjp_bwd(d, res, g):
    x, k = res
    g = g.astype(x.dtype)
    # dx: same-shape conv of g (pad d*(k-1)-p = d) with the flipped,
    # IO-transposed kernel — the SAME Pallas operator when the
    # TRANSPOSED shape also fits the budget (cin != cout changes the
    # resident-input channel count, so a supports()-eligible forward
    # does not imply an eligible dx; fall back to the XLA emitter
    # rather than crash with a zero row block).
    kT = jnp.swapaxes(k, 2, 3)[::-1, ::-1].astype(k.dtype)
    if supports(g.shape, kT.shape, d, jnp.dtype(g.dtype).itemsize):
        dx = _conv_impl(g, kT, d)
    else:
        dx = jax.lax.conv_general_dilated(
            g, kT, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # dk: 9 big-K contractions over (B, H, W); XLA's dot emitter is
    # already at the MXU roofline for these.
    dk = conv_grads.wgrad_taps(x, g, ((d, d), (d, d)), (d, d), 3, 3)
    return dx.astype(x.dtype), dk.astype(k.dtype)


dilated_conv3x3.defvjp(_vjp_fwd, _vjp_bwd)
