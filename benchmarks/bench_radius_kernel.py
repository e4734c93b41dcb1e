"""Radius-stage shootout on the real chip: XLA square-sum chain vs the
Pallas kernel variants (pallas_radius.py), measured the production way.

Methodology: a batched program scores N DISTINCT maps (like
region_selection's batched dispatch) — no serial feedback, no pool
cycling. Loop-hoisting is impossible (every map is a distinct program
input) and nothing forces artificial copies: the earlier serial-feedback
harness made `em.at[0,0,0].add(...)` materialize a full embed copy per
iteration, inflating the radius stage ~2x. Per-map time is the delta
between an N_BIG- and an N_SMALL-map program (dispatch overhead cancels;
two compiles per variant).

Run: python benchmarks/bench_radius_kernel.py  (TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp

from halo_tpu.active import pallas_radius
from halo_tpu.ops.hyperbolic import dist0

H, W, C = 1024, 2048, 64
N_SMALL, N_BIG = 1, 9


def timed(fn, *a, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench(name, one_map, ems_small, ems_big):
    def prog(ems, n):
        acc = jnp.float32(0)
        for i in range(n):
            m = one_map(ems[i])
            acc = acc + m[0, 0] + m[511, 1027]
        return acc

    f_small = jax.jit(partial(prog, n=N_SMALL))
    f_big = jax.jit(partial(prog, n=N_BIG))
    float(f_small(ems_small))
    float(f_big(ems_big))
    t_s = timed(f_small, ems_small)
    t_b = timed(f_big, ems_big)
    per = (t_b - t_s) / (N_BIG - N_SMALL)
    print(f"{name:24s}: {per * 1e3:7.3f} ms/map "
          f"({H * W / 1e6 / per:7.1f} Mpx/s)  [roofline "
          f"{H * W * C * ems_big.dtype.itemsize / 819e9 * 1e3:.3f} ms]",
          flush=True)
    return per


def main():
    key = jax.random.PRNGKey(0)
    ems = (jax.random.normal(key, (N_BIG, H, W, C), jnp.float32) * 0.5)
    ems_bf = ems.astype(jnp.bfloat16)
    ems_s = ems_bf[:N_SMALL]

    bench("xla dist0 bf16", lambda e: dist0(e.astype(jnp.float32), axis=-1),
          ems_s, ems_bf)
    for tb in (256, 128, 64):
        bench(f"pallas mxu tb={tb}",
              lambda e, tb=tb: pallas_radius.radius_map(e, variant="mxu",
                                                        tb=tb),
              ems_s, ems_bf)
    for tb in (64, 32):
        bench(f"pallas vpu tb={tb}",
              lambda e, tb=tb: pallas_radius.radius_map(e, variant="vpu",
                                                        tb=tb),
              ems_s, ems_bf)
    # f32 reference point for the XLA chain
    bench("xla dist0 f32", lambda e: dist0(e, axis=-1), ems[:N_SMALL], ems)


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
