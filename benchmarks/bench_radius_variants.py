"""Radius-map (dist0) formulations on the chip.

The radius stage of the scoring chain measures ~0.42 ms at 1024x2048x64
bf16 (~80% of its 268 MB read roofline; bench_scoring_harness.py).
Variants: (A) the shipped dist0 (elementwise square + minor-axis VPU
reduction), (B) square-sum as an MXU matvec with a ones vector, (C) B
with the atanh tail fused the same way. All value-identical in f32.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax

from halo_tpu.ops import hyperbolic as hyp

H, W, E = 1024, 2048, 64


def timed(fn, *args, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter(run, *args, small=4, big=68):
    float(run(*args, small))
    return (timed(run, *args, big) - timed(run, *args, small)) / (big - small)


def chain(radius_fn):
    @jax.jit
    def run(em0, n):
        def body(i, carry):
            em, acc = carry
            r = radius_fn(em)
            em = em.at[0, 0, 0].add((r[0, 0] * 1e-6).astype(em.dtype))
            return (em, acc + r[0, 0])
        _, acc = lax.fori_loop(0, n, body, (em0, jnp.float32(0)))
        return acc
    return run


def radius_shipped(em):
    return hyp.dist0(em.astype(jnp.float32), c=1.0, axis=-1)


def radius_matvec(em):
    x = em.astype(jnp.float32)
    ones = jnp.ones((E,), jnp.float32)
    nsq = lax.dot_general(x * x, ones, (((2,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    n = jnp.sqrt(nsq)
    n = jnp.minimum(n, 1.0 - 1e-5)
    return 2.0 * jnp.arctanh(n)


def main():
    em = (jax.random.normal(jax.random.PRNGKey(0), (H, W, E), jnp.float32)
          * 0.1).astype(jnp.bfloat16)
    a = per_iter(chain(radius_shipped), em)
    b = per_iter(chain(radius_matvec), em)
    # value check
    va = radius_shipped(em)
    vb = radius_matvec(em)
    import numpy as np
    diff = float(jnp.max(jnp.abs(va - vb)))
    print(f"A shipped dist0 : {a * 1e3:6.3f} ms/map")
    print(f"B matvec sum    : {b * 1e3:6.3f} ms/map  (max |diff| {diff:.2e})")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
