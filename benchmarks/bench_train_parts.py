"""Decompose the 355 ms source_target train step on the chip.

Times (a) the loss forward alone, (b) value_and_grad (fwd+bwd), and
(c) the full step (grads + two-group SGD update), at the production
shapes of bench_train_step.py, to attribute the gap between the ~70 ms
forward and the full step. Serially-dependent loops (state/params fed
back) so XLA cannot hoist or overlap iterations.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from halo_tpu.config import get_default_cfg
from halo_tpu.engine.optim import build_optimizer
from halo_tpu.engine.state import state_from_variables
from halo_tpu.engine.steps import make_train_step
from halo_tpu.models import build_segmentor

cfg = get_default_cfg()
cfg.merge_from_file("configs/gtav/source_target.yaml")
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
B = 2

model = build_segmentor(cfg)
tx, _ = build_optimizer(cfg, 1)
x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
variables = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, x0, train=False)
state = state_from_variables(variables, tx)
train_step = make_train_step(cfg, model, tx, "source_target")

rng = np.random.default_rng(0)
batch = {
    "source": {"img": jnp.asarray(rng.normal(size=(B, 720, 1280, 3)),
                                  jnp.float32),
               "label": jnp.asarray(rng.integers(0, 19, (B, 720, 1280)),
                                    jnp.int32)},
    "target": {"img": jnp.asarray(rng.normal(size=(B, 640, 1280, 3)),
                                  jnp.float32),
               "mask": jnp.asarray(rng.integers(0, 19, (B, 640, 1280)),
                                   jnp.int32)},
}

def _sync(out):
    """True host sync: the relay acks block_until_ready early (CLAUDE.md),
    so materialize one scalar — the program must finish to produce it."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])


def timeit(fn, *args, n=8):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


# (a) loss forward only — the same two forwards + loss stack the step
# differentiates, minus the gradient
from halo_tpu.losses import (cross_entropy_loss,  # noqa: E402
                             negative_learning_loss)
from halo_tpu.engine.steps import make_forward  # noqa: E402

forward = make_forward(model)
neg_tau = float(cfg.SOLVER.NEGATIVE_THRESHOLD)
ignore = cfg.INPUT.IGNORE_LABEL


@jax.jit
def loss_only(params, frozen, stats, batch, key):
    variables = {"params": params}
    if frozen:
        variables["frozen"] = frozen
    if stats:
        variables["batch_stats"] = stats
    k1, k2 = jax.random.split(key)
    (src_out, _), _ = forward(variables, batch["source"]["img"], True, k1,
                              mutable=True)
    (tgt_out, _), _ = forward(variables, batch["target"]["img"], True, k2,
                              mutable=True)
    loss = cross_entropy_loss(src_out, batch["source"]["label"], ignore)
    loss = loss + cross_entropy_loss(tgt_out, batch["target"]["mask"],
                                     ignore)
    p = jax.nn.softmax(tgt_out.astype(jnp.float32), axis=-1)
    return loss + negative_learning_loss(p, neg_tau)


@jax.jit
def grad_only(params, frozen, stats, batch, key):
    def f(params):
        return loss_only.__wrapped__(params, frozen, stats, batch, key)
    return jax.grad(f)(params)


full = jax.jit(train_step)

t_loss = timeit(loss_only, state.params, state.frozen, state.batch_stats,
                batch, jax.random.PRNGKey(2))
t_grad = timeit(grad_only, state.params, state.frozen, state.batch_stats,
                batch, jax.random.PRNGKey(2))


def full_once(state):
    s, m = full(state, batch, jax.random.PRNGKey(3))
    return s


t_full = timeit(full_once, state)


# (d) the two-group SGD update alone (grads -> new params/opt state)
@jax.jit
def update_only(grads, opt_state, params):
    updates, new_os = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p + u.astype(p.dtype), params, updates)
    return new_params, new_os


grads = grad_only(state.params, state.frozen, state.batch_stats, batch,
                  jax.random.PRNGKey(2))
t_upd = timeit(update_only, grads, state.opt_state, state.params)


# (e) eval-mode forwards at the same shapes (no dropout RNG, running-BN)
@jax.jit
def loss_eval(params, frozen, stats, batch):
    variables = {"params": params}
    if frozen:
        variables["frozen"] = frozen
    if stats:
        variables["batch_stats"] = stats
    src_out, _ = forward(variables, batch["source"]["img"], False)
    tgt_out, _ = forward(variables, batch["target"]["img"], False)
    loss = cross_entropy_loss(src_out, batch["source"]["label"], ignore)
    return loss + cross_entropy_loss(tgt_out, batch["target"]["mask"],
                                     ignore)


t_eval = timeit(loss_eval, state.params, state.frozen, state.batch_stats,
                batch)

print(f"loss fwd only      : {t_loss * 1e3:7.1f} ms")
print(f"eval-mode fwd+CE   : {t_eval * 1e3:7.1f} ms")
print(f"fwd+bwd grads      : {t_grad * 1e3:7.1f} ms")
print(f"sgd update only    : {t_upd * 1e3:7.1f} ms")
print(f"full step          : {t_full * 1e3:7.1f} ms")
