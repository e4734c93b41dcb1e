"""SegFormer-B4 hyper (the ACDC-branch capability) on one v5e chip:
inference images/sec at the 640x1280 eval input and the source_target
train-step images/sec at the ACDC production shapes (2x640x1280 both
domains, configs/acdc/source_target.yaml).

The reference's segformer branch publishes no numbers (it is not even
mounted in this checkout, README.md:104-116), so these rows are
capability evidence rather than a baseline race: the second model
family runs the same step library, sharding, and acquisition chain as
the flagship (engine/steps.py, active/region_selection.py).

Methodology matches bench.py: resident-pool fori chain with host
materialization, per-unit time from a big-minus-small delta.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor

H, W = 640, 1280
N_POOL = 4
I_SMALL, I_BIG = 2, 22


def _cfg():
    cfg = get_default_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs/acdc/source_target.yaml"))
    cfg.MODEL.WEIGHTS = ""
    cfg.resume = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    return cfg


def _timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_infer(model, variables):
    @jax.jit
    def infer(variables, x, n):
        def body(i, acc):
            img = jax.lax.dynamic_slice_in_dim(x, i % N_POOL, 1, 0)
            out, _ = model.apply(variables, img, size=(H, W), train=False)
            return acc + out.astype(jnp.float32)[0, 0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    x = jax.random.normal(jax.random.PRNGKey(2), (N_POOL, H, W, 3),
                          jnp.float32)
    float(infer(variables, x, 1))
    t_small = _timed(infer, variables, x, I_SMALL)
    t_big = _timed(infer, variables, x, I_BIG)
    per_img = (t_big - t_small) / (I_BIG - I_SMALL)
    return 1.0 / per_img, per_img


def bench_train(cfg, model, variables, n_steps=10):
    from halo_tpu.engine.optim import build_optimizer
    from halo_tpu.engine.state import state_from_variables
    from halo_tpu.engine.steps import make_train_step

    tx, _ = build_optimizer(cfg, 1)
    state = state_from_variables(variables, tx)
    step = jax.jit(make_train_step(cfg, model, tx, "source_target"),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    B = 2
    batch = {
        "source": {"img": jnp.asarray(rng.normal(size=(B, H, W, 3)),
                                      jnp.float32),
                   "label": jnp.asarray(rng.integers(0, 19, (B, H, W)),
                                        jnp.int32)},
        "target": {"img": jnp.asarray(rng.normal(size=(B, H, W, 3)),
                                      jnp.float32),
                   "mask": jnp.asarray(rng.integers(0, 19, (B, H, W)),
                                       jnp.int32)},
    }
    for k in (2, 3):  # compile + warm
        state, metrics = step(state, batch, jax.random.PRNGKey(k))
        float(metrics["loss"])
    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, batch, jax.random.PRNGKey(4 + i))
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n_steps)
    return 2 * B / best, best


if __name__ == "__main__":
    cfg = _cfg()
    model = build_segmentor(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    n_params = sum(int(np.prod(p.shape)) for p in
                   jax.tree_util.tree_leaves(variables["params"]))
    print(f"segformer_mitb4 hyper: {n_params/1e6:.1f}M params", flush=True)
    img_s, per_img = bench_infer(model, variables)
    print(f"inference @640x1280 bf16: {img_s:.1f} img/s "
          f"({per_img*1e3:.1f} ms/img)", flush=True)

    # int8 W8A8 eval leg (TPU.QUANT_EVAL): QuantDense over the MiT
    # attention/FFN projections with Cin>=128 plus the head's fuse conv
    # (per-GEMM premise in bench_int8_mit.py). PTQ numerics — the bf16
    # row above stays the like-for-like number.
    from halo_tpu.ops import quant
    cfg_q = _cfg()
    cfg_q.TPU.QUANT_EVAL = True
    model_q = build_segmentor(cfg_q)
    vq = model_q.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    vq = {**vq, "params": variables["params"]}
    vq = quant.calibrate(
        model_q, vq,
        [jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 3),
                           jnp.float32)], size=(H, W))
    img_s_q, per_img_q = bench_infer(model_q, vq)
    print(f"inference @640x1280 int8 W8A8: {img_s_q:.1f} img/s "
          f"({per_img_q*1e3:.1f} ms/img)", flush=True)

    model = build_segmentor(_cfg())  # restore float lowering globals
    tr_img_s, per_step = bench_train(cfg, model, variables)
    print(f"source_target step (2+2 @640x1280): {tr_img_s:.1f} img/s "
          f"({per_step*1e3:.1f} ms/step)", flush=True)
