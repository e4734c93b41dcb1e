"""Flagship inference: int8 W8A8 eval path (TPU.QUANT_EVAL) vs bf16.

Premise measured in bench_int8.py: XLA lowers s8 x s8 -> s32 onto the
v5e MXU at its double rate through both dot_general and the dilated conv
emitter (1.7-2.0x at the trunk/head shapes). This harness measures what
that buys END-TO-END on the flagship eval forward (DeepLab-v3+/R101
hyper @640x1280, logits at input res — same program bench.py times):
the quantized build routes every stride-1 ungrouped conv (trunk minus
stem + decoder dense convs) through int8; depthwise stencils, the stem,
the logits/embedding producers and the hyperbolic head stay float.

Timing: resident image pool, fori_loop cycling i % N (loop can't hoist),
delta-of-N trip counts spanning >=20 images (CLAUDE.md relay rule).

Run on an idle chip: JAX_PLATFORMS=axon python benchmarks/bench_int8_infer.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.ops import quant

H, W = 640, 1280
N_POOL = 8
I_SMALL, I_BIG = 2, 22


def _timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def build(quant_eval):
    cfg = get_default_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), os.pardir,
                     "configs/gtav/source_target.yaml"))
    cfg.MODEL.WEIGHTS = ""
    cfg.resume = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.QUANT_EVAL = quant_eval
    model = build_segmentor(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    return model, variables


def per_img(model, variables, x):
    @jax.jit
    def infer(variables, x, n):
        def body(i, acc):
            img = jax.lax.dynamic_slice_in_dim(x, i % N_POOL, 1, 0)
            out, _ = model.apply(variables, img, size=(H, W), train=False)
            return acc + out.astype(jnp.float32)[0, 0, 0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(infer(variables, x, 1))  # compile + warm
    t_small = _timed(infer, variables, x, I_SMALL)
    t_big = _timed(infer, variables, x, I_BIG)
    return (t_big - t_small) / (I_BIG - I_SMALL)


def main():
    print("devices:", jax.devices())
    x = jax.random.normal(jax.random.PRNGKey(2), (N_POOL, H, W, 3),
                          jnp.float32)

    model_f, var_f = build(False)
    t_f = per_img(model_f, var_f, x)
    print(f"bf16  : {t_f * 1e3:6.2f} ms/img  ({1.0 / t_f:5.1f} img/s)")

    model_q, var_q = build(True)
    # Calibrate on pool slices (random-data calibration is fine for a
    # THROUGHPUT measurement; accuracy calibration uses real batches).
    var_q = quant.calibrate(model_q, var_q,
                            [x[i:i + 1] for i in range(4)], size=(H, W))
    quant.assert_calibrated(var_q)
    t_q = per_img(model_q, var_q, x)
    print(f"int8  : {t_q * 1e3:6.2f} ms/img  ({1.0 / t_q:5.1f} img/s)  "
          f"speedup {t_f / t_q:4.2f}x")


if __name__ == "__main__":
    main()
