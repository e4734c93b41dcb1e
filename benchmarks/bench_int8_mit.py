"""Probe: does the MXU's double-rate s8 path pay at MiT's GEMM shapes?

bench_int8.py established that XLA lowers s8 x s8 -> s32 onto the v5e
MXU at ~2x the bf16 rate AT THE FLAGSHIP TRUNK SHAPES (K,N >= 256,
M = 12800). The MiT encoder is a different regime: bench_segformer.py's
stage split shows stage 3 (27 blocks, seq 3200, dim 320) running at
~31% MXU utilization — a small-tensor TILING floor, not a FLOP-rate
bound. If the GEMMs are tiling-bound, halving the per-element FLOP cost
buys nothing; if they are weight/activation-traffic bound, int8 halves
the traffic too and should still win. This measures which, per stage
family, before any QuantDense machinery gets built on top.

Shapes: the per-block GEMMs of MiT-B4 at the 640x1280 eval input
(B4 depths 3/8/27/3; stage tokens 51200/12800/3200/800; SR-reduced KV
sequence 800 at every stage). fc1/fc2 are the MixFFN pair (4x ratio);
qkvp are the attention projections.

Timing methodology: bench_int8.py's (pool-cycling fori_loop, adaptive
delta-of-N spanning >=80 ms, jnp.max consumption so XLA can't fold the
GEMM into its consumer).

MEASURED (v5e-1, 2026-08-19, concurrent test-suite CPU load — relative
numbers; the adaptive delta-of-N timing is load-robust):

  s1 fc1   64->256   M=51200   bf16 24 us ( 71 TOP/s)  int8 27 us ( 62)  0.87x
  s1 fc2  256->64    M=51200   bf16 38 us ( 44)        int8 21 us ( 80)  1.80x
  s2 fc1  128->512   M=12800   bf16 15 us (110)        int8 14 us (124)  1.12x
  s3 qkvp 320->320   M=3200    bf16  9 us ( 75)        int8  6 us (107)  1.42x
  s3 kv   320->320   M=800     bf16  4 us ( 41)        int8  3 us ( 51)  1.22x
  s3 fc1  320->1280  M=3200    bf16 22 us (118)        int8 16 us (168)  1.42x
  s3 fc2 1280->320   M=3200    bf16 22 us (122)        int8 14 us (184)  1.51x
  s4 fc1  512->2048  M=800     bf16 14 us (122)        int8  8 us (199)  1.63x
  head lin 512->768  M=800     bf16  7 us ( 90)        int8  5 us (129)  1.43x

POSITIVE at every shape with Cin >= 128 (1.1-1.8x): the transformer
GEMMs are traffic-bound, so int8's halved bytes pay even at stage 3's
~31%-util tiling floor. NEGATIVE at Cin = 64 (s1 fc1, 0.87x): a K=64
contraction underfills the MXU's 128 lanes, so the GEMM is cheap and
the activation-quantize epilogue's extra VPU work dominates. QuantDense
therefore gates on Cin >= 128 (models/layers.py:QuantDense.min_cin) —
stage-1's q/k/v/proj/fc1 (dim 64) stay bf16, everything wider
quantizes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from bench_int8 import POOL, loop, per_iter

# (label, M, K, N) — MiT-B4 per-block GEMMs at 640x1280 eval input.
GEMMS = [
    ("s1 fc1   64->256   M=51200", 160 * 320, 64, 256),
    ("s1 fc2  256->64    M=51200", 160 * 320, 256, 64),
    ("s2 fc1  128->512   M=12800", 80 * 160, 128, 512),
    ("s3 qkvp 320->320   M=3200 ", 40 * 80, 320, 320),
    ("s3 kv   320->320   M=800  ", 800, 320, 320),       # SR-reduced seq
    ("s3 fc1  320->1280  M=3200 ", 40 * 80, 320, 1280),
    ("s3 fc2 1280->320   M=3200 ", 40 * 80, 1280, 320),
    ("s4 fc1  512->2048  M=800  ", 20 * 40, 512, 2048),
    ("head lin 512->768  M=800  ", 20 * 40, 512, 768),
]


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices())
    print(f"dot_general at MiT-B4 shapes (pool={POOL}):")
    for label, M, K, N in GEMMS:
        flops = 2 * M * K * N
        xs_f = jax.random.normal(key, (POOL, M, K), jnp.bfloat16)
        w_f = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02
        xs_i = jax.random.randint(key, (POOL, M, K), -127, 128, jnp.int8)
        w_i = jax.random.randint(key, (K, N), -127, 128, jnp.int8)

        def dot_bf16(w, x):
            y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            return jnp.max(y)

        def dot_int8(w, x):
            y = lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            return jnp.max(y).astype(jnp.float32)

        t_f = per_iter(loop(dot_bf16), w_f, xs_f)
        t_i = per_iter(loop(dot_int8), w_i, xs_i)
        print(f"  {label:28s} bf16 {t_f * 1e6:6.0f} us "
              f"({flops / t_f / 1e12:5.1f} TOP/s)   int8 {t_i * 1e6:6.0f} us "
              f"({flops / t_i / 1e12:5.1f} TOP/s)  speedup {t_f / t_i:4.2f}x")


if __name__ == "__main__":
    main()
