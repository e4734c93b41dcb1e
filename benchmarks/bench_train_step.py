"""Train-step throughput at production shapes on one v5e chip."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.engine.optim import build_optimizer
from halo_tpu.engine.state import state_from_variables
from halo_tpu.engine.steps import make_train_step

cfg = get_default_cfg()
cfg.merge_from_file("configs/gtav/source_target.yaml")
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
B = 2  # per-chip batch (reference: 2/GPU)

model = build_segmentor(cfg)
tx, _ = build_optimizer(cfg, 1)
x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x0, train=False)
state = state_from_variables(variables, tx)
step = jax.jit(make_train_step(cfg, model, tx, "source_target"))

rng = np.random.default_rng(0)
def mk(i):
    return {
      "source": {"img": jnp.asarray(rng.normal(size=(B, 720, 1280, 3)), jnp.float32),
                 "label": jnp.asarray(rng.integers(0, 19, (B, 720, 1280)), jnp.int32)},
      "target": {"img": jnp.asarray(rng.normal(size=(B, 640, 1280, 3)), jnp.float32),
                 "mask": jnp.asarray(rng.integers(0, 19, (B, 640, 1280)), jnp.int32)},
    }
batches = [mk(i) for i in range(2)]

t0 = time.time()
state, metrics = step(state, batches[0], jax.random.PRNGKey(2))
jax.block_until_ready(metrics["loss"])
print("compile+run %.1fs, loss %.3f" % (time.time() - t0, float(metrics["loss"])))

N = 10
t0 = time.perf_counter()
for i in range(N):
    state, metrics = step(state, batches[i % 2], jax.random.PRNGKey(i))
jax.block_until_ready(metrics["loss"])
dt = (time.perf_counter() - t0) / N
print("steady step %.1f ms -> %.2f img/s/chip (src+tgt pairs: %.2f/s)" % (
    dt * 1e3, 2 * B / dt, B / dt))
