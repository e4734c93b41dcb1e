"""Attribute the train step's backward: trunk vs head, fwd vs vjp, at the
production source shapes. bwd_excess = vjp_time - 3x fwd_time is the
anomaly to chase (dgrad+wgrad ~= 2x fwd FLOPs, so vjp ~= 3x fwd total)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.models.build import build_feature_extractor

cfg = get_default_cfg()
cfg.merge_from_file("configs/gtav/source_target.yaml")
cfg.TPU.COMPUTE_DTYPE = "bfloat16"

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0])

def timeit(fn, *args, n=8):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n

B, H, W = 2, 720, 1280
x = jnp.asarray(np.random.default_rng(0).normal(size=(B, H, W, 3)),
                jnp.float32)

# ---- trunk only ----
trunk = build_feature_extractor(cfg)
tvars = trunk.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   train=False)

@jax.jit
def trunk_fwd(params, x):
    out = trunk.apply({"params": params,
                       **{k: v for k, v in tvars.items() if k != "params"}},
                      x, train=True)
    return sum(jnp.sum(v.astype(jnp.float32)) for v in
               jax.tree_util.tree_leaves(out))

@jax.jit
def trunk_grad(params, x):
    return jax.grad(trunk_fwd.__wrapped__)(params, x)

@jax.jit
def trunk_grad_x(params, x):
    # input-grad only: fwd + dgrad chain, NO weight grads
    return jax.grad(trunk_fwd.__wrapped__, argnums=1)(params, x)

t_f = timeit(trunk_fwd, tvars["params"], x)
t_gx = timeit(trunk_grad_x, tvars["params"], x)
t_g = timeit(trunk_grad, tvars["params"], x)
print("trunk fwd %7.1f ms   fwd+dgrad %7.1f ms   fwd+dgrad+wgrad %7.1f ms"
      % (t_f * 1e3, t_gx * 1e3, t_g * 1e3), flush=True)
print("  => dgrad %.1f ms (%.2fx fwd), wgrad %.1f ms (%.2fx fwd)" %
      ((t_gx - t_f) * 1e3, (t_gx - t_f) / t_f,
       (t_g - t_gx) * 1e3, (t_g - t_gx) / t_f), flush=True)

# ---- full model ----
model = build_segmentor(cfg)
mvars = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)},
                   jnp.zeros((1, 64, 64, 3)), train=False)

@jax.jit
def full_fwd(params, x):
    (out, aux), _ = model.apply(
        {"params": params,
         **{k: v for k, v in mvars.items() if k != "params"}},
        x, size=(H, W), train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    return jnp.sum(out.astype(jnp.float32)) + jnp.sum(
        aux.astype(jnp.float32))

@jax.jit
def full_grad(params, x):
    return jax.grad(full_fwd.__wrapped__)(params, x)

t_f = timeit(full_fwd, mvars["params"], x)
t_g = timeit(full_grad, mvars["params"], x)
print("full  fwd %7.1f ms   fwd+bwd %7.1f ms   ratio %.2f" %
      (t_f * 1e3, t_g * 1e3, t_g / t_f), flush=True)
