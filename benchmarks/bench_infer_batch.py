"""Flagship inference throughput vs batch size on the chip.

The reference evaluates at batch 1/GPU (core/train_learners.py:598), but
BASELINE.json's metric is images/sec — on TPU, batching raises MXU
utilization (more GEMM rows per dispatch). Measures img/s at b=1,2,4.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor

H, W = 640, 1280
SMALL, BIG = 2, 12


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = build_segmentor(cfg)
    x1 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x1, train=False)

    for b in (1, 2, 4):
        xs = jax.random.normal(jax.random.PRNGKey(2), (2, b, H, W, 3),
                               jnp.float32)

        @jax.jit
        def infer(v, xs, n):
            def body(i, acc):
                img = lax.dynamic_index_in_dim(xs, i % 2, 0, keepdims=False)
                out, _ = model.apply(v, img, size=(H, W), train=False)
                return acc + out.astype(jnp.float32)[0, 0, 0, 0]
            return lax.fori_loop(0, n, body, jnp.float32(0))

        float(infer(variables, xs, 1))
        t = (timed(infer, variables, xs, BIG)
             - timed(infer, variables, xs, SMALL)) / (BIG - SMALL)
        print(f"b={b}: {t * 1e3:7.2f} ms/batch  {b / t:6.1f} img/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
