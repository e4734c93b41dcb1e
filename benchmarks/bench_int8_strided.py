"""Probe: does the s8 MXU path also pay for STRIDED ungrouped convs?

quant_eligible (models/layers.py) currently gates the int8 W8A8 eval
path to stride-1 ungrouped convs — the families bench_int8.py measured.
The float residue of both quantized models still contains strided
ungrouped convs: the ResNet layer2 transition (3x3 s2 and the 1x1 s2
downsample), the MiT overlap patch embeds (3x3 s2), and the MiT SR-KV
reduction convs (k=s in {8,4,2}). This measures bf16 vs int8 at exactly
those shapes (640x1280 eval input resolutions) before widening the gate.

The stem-shaped 7x7 s2 3->64 rides along as a control: its Cin=3
underfills the MXU lanes so badly that the conv is layout-bound, where
int8 cannot help (and the first-layer PTQ exclusion keeps it float
regardless).

Timing methodology: bench_int8.py's (pool-cycling fori_loop, adaptive
delta-of-N spanning >=80 ms, jnp.max consumption).

Measured results (v5e, 2026-08-19, round 4):

    resnet l2 3x3 s2 128->128 @160x320  bf16 112us (33.6T)  int8  77us (49.0T)  1.46x
    resnet l2 1x1 s2 256->512 @160x320  bf16  59us (56.8T)  int8  40us (83.7T)  1.47x
    mit pe2 3x3 s2  64->128 @160x320    bf16  91us (20.7T)  int8  97us (19.4T)  0.93x
    mit pe3 3x3 s2 128->320 @80x160     bf16  33us (71.9T)  int8  22us (109.5T) 1.52x
    mit pe4 3x3 s2 320->512 @40x80      bf16  27us (87.6T)  int8  30us (77.6T)  0.89x
    mit sr1 8x8 s8  64->64  @160x320    bf16  90us ( 4.6T)  int8  93us ( 4.5T)  0.98x
    mit sr2 4x4 s4 128->128 @80x160     bf16  14us (30.5T)  int8  13us (32.1T)  1.05x
    mit sr3 2x2 s2 320->320 @40x80      bf16  17us (39.3T)  int8  16us (40.5T)  1.03x
    stem 7x7 s2 3->64 @640x1280 ctrl    bf16 1366us ( 2.8T) int8 1332us ( 2.9T) 1.02x

Conclusion (acted on in models/layers.py): strided s8 convs DO hit the
double-rate pipeline when the input is wide (Cin >= 128) AND the output
grid is large enough to fill it (>= ~3200 positions; the 800-position
shapes lose to the quantize-epilogue overhead). quant_eligible therefore
extends to strided ungrouped convs with Cin >= 128 (static gate), with
a per-trace float fallback below _MIN_STRIDED_POSITIONS=2048 output
positions. Negative results recorded: MiT pe2/pe4 and all SR-KV
reduction convs stay float; the Cin=3 stem is layout-bound as predicted.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from bench_int8 import POOL, loop, per_iter

# (label, H, W, Cin, Cout, k, stride)
CONVS = [
    ("resnet l2 3x3 s2 128->128 @160x320", 160, 320, 128, 128, 3, 2),
    ("resnet l2 1x1 s2 256->512 @160x320", 160, 320, 256, 512, 1, 2),
    ("mit pe2 3x3 s2  64->128 @160x320", 160, 320, 64, 128, 3, 2),
    ("mit pe3 3x3 s2 128->320 @80x160 ", 80, 160, 128, 320, 3, 2),
    ("mit pe4 3x3 s2 320->512 @40x80  ", 40, 80, 320, 512, 3, 2),
    ("mit sr1 8x8 s8  64->64  @160x320", 160, 320, 64, 64, 8, 8),
    ("mit sr2 4x4 s4 128->128 @80x160 ", 80, 160, 128, 128, 4, 4),
    ("mit sr3 2x2 s2 320->320 @40x80  ", 40, 80, 320, 320, 2, 2),
    ("stem 7x7 s2 3->64 @640x1280 ctrl", 640, 1280, 3, 64, 7, 2),
]


def main():
    key = jax.random.PRNGKey(0)
    print("devices:", jax.devices())
    print(f"strided conv_general_dilated, bf16 vs int8 (pool={POOL}):")
    for label, H, W, cin, cout, k, s in CONVS:
        ho, wo = H // s, W // s
        flops = 2 * ho * wo * k * k * cin * cout
        p = k // 2
        xs_f = jax.random.normal(key, (POOL, 1, H, W, cin), jnp.bfloat16)
        w_f = jax.random.normal(key, (k, k, cin, cout), jnp.bfloat16) * 0.02
        xs_i = jax.random.randint(key, (POOL, 1, H, W, cin), -127, 128,
                                  jnp.int8)
        w_i = jax.random.randint(key, (k, k, cin, cout), -127, 128, jnp.int8)

        def conv(w, x, acc_t):
            y = lax.conv_general_dilated(
                x, w, (s, s), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_t)
            return jnp.max(y).astype(jnp.float32)

        t_f = per_iter(loop(lambda w, x: conv(w, x, jnp.float32)), w_f, xs_f)
        t_i = per_iter(loop(lambda w, x: conv(w, x, jnp.int32)), w_i, xs_i)
        print(f"  {label:33s} bf16 {t_f * 1e6:6.0f} us "
              f"({flops / t_f / 1e12:5.1f} TOP/s)   int8 {t_i * 1e6:6.0f} us "
              f"({flops / t_i / 1e12:5.1f} TOP/s)  speedup {t_f / t_i:4.2f}x")


if __name__ == "__main__":
    main()
