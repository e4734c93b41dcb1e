"""Production sweep scoring: materializing resize->score vs the fused
upsample+score path (TPU.FUSED_UPSAMPLE), on-chip per-image time.

The sweep upsamples model outputs (logits at input res 640x1280, the
Poincare embedding at feature res 80x160) to native 1024x2048 before
scoring (reference: build.py:122-144). The materializing path writes +
re-reads ~350 MB of native maps per image; the fused path
(scoring.fused_upsample_region_score) reduces interpolated row blocks
straight to the per-pixel maps. Batched-distinct timing (see bench.py).

Run: python benchmarks/bench_fused_upsample.py  (TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp

from halo_tpu.active.scoring import (floating_region_score,
                                     fused_upsample_region_score)
from halo_tpu.ops.resize import resize_bilinear

NATIVE = (1024, 2048)
LOGITS_HW = (640, 1280)   # model output res (input-res logits)
EMBED_HW = (80, 160)      # feature res (OS8 of 640x1280)
C, E = 19, 64
NS, NB = 2, 10


def timed(fn, *a, reps=5, inner=6):
    # queued-dispatch timing: see bench.py:_timed_queued
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*a)
        float(out)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def one_materializing(lg, em):
    out = resize_bilinear(lg.astype(jnp.float32), NATIVE)
    out = out.astype(jnp.bfloat16)
    aux = resize_bilinear(em.astype(jnp.float32), NATIVE)
    aux = aux.astype(jnp.bfloat16)
    s, _, _ = floating_region_score(
        out, aux, unc_type="entropy", pur_type="radius", size=3,
        num_classes=C, normalize=True)
    return s


def one_fused(lg, em, block_rows):
    s, _, _ = fused_upsample_region_score(
        lg, em, NATIVE, None, score_dtype=jnp.bfloat16,
        block_rows=block_rows, unc_type="entropy", pur_type="radius",
        size=3, num_classes=C, normalize=True)
    return s


def bench(name, one_map, lgs, ems):
    def prog(lgs, ems, n):
        acc = jnp.float32(0)
        for i in range(n):
            s = one_map(lgs[i], ems[i])
            acc = acc + s[0, 0] + s[511, 1027]
        return acc

    fs = jax.jit(partial(prog, n=NS))
    fb = jax.jit(partial(prog, n=NB))
    float(fs(lgs[:NS], ems[:NS]))
    float(fb(lgs, ems))
    t_s = timed(fs, lgs[:NS], ems[:NS])
    t_b = timed(fb, lgs, ems)
    per = (t_b - t_s) / (NB - NS)
    print(f"{name:28s}: {per * 1e3:7.3f} ms/img (upsample+score)",
          flush=True)
    return per


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    lgs = jax.random.normal(k1, (NB,) + LOGITS_HW + (C,), jnp.bfloat16)
    ems = jax.random.normal(k2, (NB,) + EMBED_HW + (E,), jnp.bfloat16) \
        * jnp.bfloat16(0.5)

    bench("materializing resize+score", one_materializing, lgs, ems)
    for blk in (128, 64, 32):
        bench(f"fused (block_rows={blk})",
              partial(one_fused, block_rows=blk), lgs, ems)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
