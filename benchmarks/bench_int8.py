"""Probe: does int8 on the v5e MXU beat bf16 at the trunk's shapes?

The v5e MXU rates int8 at 2x the bf16 throughput (394 vs 197 TOPS), so
a post-training-quantized inference path could in principle halve the
trunk's ~8 ms/img — IF XLA actually lowers s8 x s8 -> s32 contractions
onto the MXU at rate through this stack. This measures that premise
before any quantization machinery gets built:

  dot   : lax.dot_general, bf16 (f32 acc) vs int8 (int32 acc), at the
          flagship trunk/head GEMM shapes (M = 80*160 feature pixels)
  conv  : lax.conv_general_dilated 3x3 rhs_dilation=2, bf16 vs int8,
          at the layer3 shape (the trunk's dominant conv family)

Each variant also reports the implied TOP/s so MXU-rate lowering is
distinguishable from "compiles but upcasts" (an int8 path that runs at
bf16 rate or slower is a negative result, not a feature gate).

Timing: pool-cycling fori_loop, delta-of-N with N grown until the
measured difference spans >=80 ms (relay jitter is ms-scale; fixed
N=20 produced negative times at these us-scale programs). Outputs are
consumed by jnp.max — slice/sum consumption let XLA push the reduce
INTO the dot and dead-code the GEMM (one row read 593 "TOP/s").

MEASURED (v5e-1, idle chip, 2026-08-18) — POSITIVE result:

  l3 1x1 1024->256             bf16  48 us (141 TOP/s)  int8  26 us (257)  1.82x
  l3 3x3 im2col 2304->256      bf16  91 us (166)        int8  51 us (298)  1.79x
  l3 1x1 256->1024             bf16  40 us (170)        int8  32 us (211)  1.24x
  head 3x3 im2col 23040->512   bf16 1588 us (190)       int8 805 us (375)  1.97x
  conv 3x3 d=2 (80,160,256)^2  bf16 123 us (122)        int8  74 us (205)  1.68x

XLA lowers s8 x s8 -> s32 onto the v5e MXU at its double rate through
both dot_general AND the dilated conv emitter — an int8 PTQ inference
path is hardware-justified (ops/quant.py builds on this).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax

SMALL, BIG = 2, 22
POOL = 2
M = 80 * 160  # flagship feature-map pixels at OS8 (640x1280 input)

# (label, K, N): layer3 1x1 in/out, layer3 3x3 as im2col, head bottleneck
GEMMS = [
    ("l3 1x1 1024->256", 1024, 256),
    ("l3 3x3 im2col 2304->256", 2304, 256),
    ("l3 1x1 256->1024", 256, 1024),
    ("head 3x3 im2col 23040->512", 23040, 512),
]


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter(run, *args):
    """Delta-of-N per-iteration time, with N grown until the MEASURED
    time difference spans >=80 ms (relay dispatch jitter is ms-scale
    and load-dependent; estimating N from a coarse pass undershoots
    because overhead inflates the estimate and shrinks the delta)."""
    float(run(*args, SMALL))  # compile + warm
    delta = 200
    while True:
        base = timed(run, *args, 50)
        big = timed(run, *args, 50 + delta)
        if big - base >= 0.08 or delta >= 800_000:
            return (big - base) / delta
        delta *= 4


def loop(fn_one):
    @jax.jit
    def run(w, xs, n):
        def body(i, acc):
            x = lax.dynamic_index_in_dim(xs, i % POOL, 0, keepdims=False)
            return acc + fn_one(w, x)
        return lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def bench_dots():
    key = jax.random.PRNGKey(0)
    print(f"dot_general, M={M}:")
    for label, K, N in GEMMS:
        flops = 2 * M * K * N
        xs_f = jax.random.normal(key, (POOL, M, K), jnp.bfloat16)
        w_f = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
        xs_i = jax.random.randint(key, (POOL, M, K), -127, 128, jnp.int8)
        w_i = jax.random.randint(key, (K, N), -127, 128, jnp.int8)

        # Consume via max: a reduce XLA can't algebraically rewrite
        # (slice/sum of a dot get pushed INTO the dot, dead-coding the
        # GEMM — the 256->1024 row measured 593 "TOP/s" with y[0, 0]).
        # The max fuses into the GEMM epilogue: no extra HBM pass.
        def dot_bf16(w, x):
            y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return jnp.max(y)

        def dot_int8(w, x):
            y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return jnp.max(y).astype(jnp.float32)

        t_f = per_iter(loop(dot_bf16), w_f, xs_f)
        print(f"  {label:28s} bf16 {t_f * 1e6:7.0f} us "
              f"({flops / t_f / 1e12:5.1f} TOP/s)", end="")
        try:
            t_i = per_iter(loop(dot_int8), w_i, xs_i)
            print(f"   int8 {t_i * 1e6:7.0f} us "
                  f"({flops / t_i / 1e12:5.1f} TOP/s)  "
                  f"speedup {t_f / t_i:4.2f}x")
        except Exception as e:  # noqa: BLE001 - probe records the failure
            print(f"   int8 FAILED: {type(e).__name__}: {str(e)[:120]}")


def bench_convs():
    key = jax.random.PRNGKey(1)
    C, d = 256, 2
    flops = 2 * M * 9 * C * C
    print(f"conv 3x3 d={d}, (1,80,160,{C})->{C}:")
    xs_f = jax.random.normal(key, (POOL, 1, 80, 160, C), jnp.bfloat16)
    w_f = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.02
    xs_i = jax.random.randint(key, (POOL, 1, 80, 160, C), -127, 128, jnp.int8)
    w_i = jax.random.randint(key, (3, 3, C, C), -127, 128, jnp.int8)

    def conv(w, x, acc_t):
        dnum = lax.conv_dimension_numbers(x.shape, w.shape,
                                          ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
            dimension_numbers=dnum, preferred_element_type=acc_t)
        return jnp.max(y).astype(jnp.float32)

    t_f = per_iter(loop(lambda w, x: conv(w, x, jnp.float32)), w_f, xs_f)
    print(f"  bf16 {t_f * 1e6:7.0f} us ({flops / t_f / 1e12:5.1f} TOP/s)",
          end="")
    try:
        t_i = per_iter(loop(lambda w, x: conv(w, x, jnp.int32)), w_i, xs_i)
        print(f"   int8 {t_i * 1e6:7.0f} us "
              f"({flops / t_i / 1e12:5.1f} TOP/s)  speedup {t_f / t_i:4.2f}x")
    except Exception as e:  # noqa: BLE001
        print(f"   int8 FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_dots()
    bench_convs()
