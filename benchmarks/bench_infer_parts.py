"""Decompose flagship inference time on the chip: stem vs trunk vs head.

DeepLab-v3+/R101 hyper at 640x1280 bf16 measures ~16 ms/img while the
MXU-ideal for its ~0.9 TFLOP is ~5 ms. Candidate sinks: the 7x7/s2 stem
conv (3 input channels = 3/128 MXU lanes), the dilated layer3/4, the
ASPP+decoder+hyper head, and the 19-ch logits upsample. Times each stage
with the large-trip-count fori_loop pattern (see bench.py methodology).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor

H, W = 640, 1280
SMALL, BIG = 2, 22


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter(fn, *args):
    float(fn(*args, SMALL))  # warm (same program: dynamic trip count)
    return (timed(fn, *args, BIG) - timed(fn, *args, SMALL)) / (BIG - SMALL)


def loop(fn_one, pool=4):
    """Time fn_one inside a fori_loop over a pool of ``pool`` inputs.

    The body MUST depend on the loop index: an invariant body gets
    hoisted by XLA and the loop times nothing (measured: a 'trunk' loop
    collapsing to 0.03 ms/iter on CPU). Indexing a pool with i % pool
    keeps every iteration's compute live, like bench.py's harness.
    """
    @jax.jit
    def run(v, xs, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xs, i % pool, 0,
                                             keepdims=False)
            return acc + fn_one(v, x)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def main():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = build_segmentor(cfg)
    xs = jax.random.normal(jax.random.PRNGKey(0), (4, 1, H, W, 3),
                           jnp.float32)
    x = xs[0]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)

    # full forward, logits at input res
    full = loop(lambda v, x: model.apply(v, x, size=(H, W), train=False)[0]
                .astype(jnp.float32)[0, 0, 0, 0])
    t_full = per_iter(full, variables, xs)

    # full forward, logits left at feature res (no final upsample)
    feat = loop(lambda v, x: model.apply(v, x, size=None, train=False)[0]
                .astype(jnp.float32)[0, 0, 0, 0])
    t_feat = per_iter(feat, variables, xs)

    # trunk only (feature extractor submodule, same params)
    fe = model.feature_extractor
    fe_vars = {k: v["feature_extractor"] for k, v in variables.items()
               if "feature_extractor" in v}

    def trunk_one(v, x):
        feats = fe.apply(v, x, train=False)
        return feats["out"].astype(jnp.float32)[0, 0, 0, 0]
    trunk = loop(trunk_one)
    t_trunk = per_iter(trunk, fe_vars, xs)

    # stem proxy: the 7x7/s2 conv alone at this res (fresh tiny module)
    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                           use_bias=False, dtype=jnp.bfloat16)(x)

    stem = Stem()
    sv = stem.init(jax.random.PRNGKey(0), x)
    stem_loop = loop(lambda v, x: stem.apply(v, x)
                     .astype(jnp.float32)[0, 0, 0, 0])
    t_stem = per_iter(stem_loop, sv, xs)

    print(f"full fwd + upsample : {t_full * 1e3:7.2f} ms/img")
    print(f"full fwd (feat res) : {t_feat * 1e3:7.2f} ms/img")
    print(f"trunk only          : {t_trunk * 1e3:7.2f} ms/img")
    print(f"stem 7x7/s2 conv    : {t_stem * 1e3:7.2f} ms/img")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
