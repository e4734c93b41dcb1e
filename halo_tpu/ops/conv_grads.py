"""Shared weight-grad building block for the stencil-family conv VJPs.

Every custom conv VJP in this codebase (models/layers.py dense_stencil +
native_conv_gemm_wgrad, ops/pallas_conv.py dilated_conv3x3) computes the
weight grad the same way: dk[i, j] = tap(i, j)^T @ g contracting over
(B, Ho, Wo) — one big-K MXU GEMM per kernel tap. XLA's own wgrad of the
dilated stride-1 convs measures 1.6x their forward on v5e while this
form runs at/below par (benchmarks/bench_stage_bwd.py), which is why the
VJPs exist. One implementation here so the accumulation dtype and the
tap/margin arithmetic cannot drift apart across copies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wgrad_taps(x, g, padding, dilation, kh: int, kw: int):
    """Weight grad of a stride-1 NHWC/HWIO conv as kh*kw shifted GEMMs.

    Args:
      x: (B, H, W, Cin) forward input.
      g: (B, Ho, Wo, Cout) output cotangent.
      padding: ((ph0, ph1), (pw0, pw1)) numeric forward padding.
      dilation: (dh, dw) forward rhs dilation.

    Returns (kh, kw, Cin, Cout) in the accumulation dtype — at least f32
    (f64 inputs accumulate in f64 so CPU x64 goldens stay exact); callers
    cast to the kernel dtype.
    """
    (ph0, ph1), (pw0, pw1) = padding
    dh, dw = dilation
    acc_dt = jnp.promote_types(g.dtype, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    ho, wo = g.shape[1], g.shape[2]
    taps = [
        jax.lax.dot_general(
            xp[:, i * dh:i * dh + ho, j * dw:j * dw + wo, :], g,
            (((0, 1, 2), (0, 1, 2)), ((), ())),
            preferred_element_type=acc_dt)
        for i in range(kh) for j in range(kw)
    ]
    return jnp.stack(taps).reshape(
        (kh, kw) + taps[0].shape[-2:])
