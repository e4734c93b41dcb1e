"""Classifier-head backward at production feature shapes (B=2 source,
trunk taps low 180x320x256 / out 90x160x2048), train mode with live-BN
mutation and dropout RNG. Round-3 measurement:

    head feat-res  : fwd 24.44  fwd+bwd 65.99 (ratio 2.70)
    head native-res: fwd 24.65  fwd+bwd 65.77 (ratio 2.67)

Head bwd = 1.70x fwd — BELOW the dgrad+wgrad=2x-fwd par; and the final
720x1280 logits upsample is free in both directions (the banded-matmul
resize, ops/resize.py, transposes to banded contractions under autodiff).
No head-side backward anomaly to chase.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.config import get_default_cfg
from halo_tpu.models.build import build_classifier

cfg = get_default_cfg()
cfg.merge_from_file("/root/repo/configs/gtav/source_target.yaml")
cfg.TPU.COMPUTE_DTYPE = "bfloat16"
head = build_classifier(cfg)

B = 2
feats = {
    "low": jax.random.normal(jax.random.PRNGKey(0), (B, 180, 320, 256),
                             jnp.bfloat16),
    "out": jax.random.normal(jax.random.PRNGKey(1), (B, 90, 160, 2048),
                             jnp.bfloat16),
}
v = head.init({"params": jax.random.PRNGKey(2),
               "dropout": jax.random.PRNGKey(3)}, feats, train=False)
other = {k: val for k, val in v.items() if k != "params"}

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.ravel(leaf)[0].astype(jnp.float32))

def timeit(fn, *args, n=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n

def make(size):
    def fwd(params, feats):
        (out, embed), _ = head.apply({"params": params, **other}, feats,
                                     size=size, train=True,
                                     mutable=["batch_stats"],
                                     rngs={"dropout": jax.random.PRNGKey(4)})
        return (jnp.sum(out.astype(jnp.float32))
                + jnp.sum(embed.astype(jnp.float32)))
    return jax.jit(fwd), jax.jit(jax.grad(fwd))

for size, tag in ((None, "feat-res  "), ((720, 1280), "native-res")):
    f, g = make(size)
    t_f = timeit(f, v["params"], feats)
    t_g = timeit(g, v["params"], feats)
    print(f"head {tag}: fwd {t_f*1e3:6.2f}  fwd+bwd {t_g*1e3:6.2f} "
          f"(ratio {t_g/t_f:4.2f})", flush=True)
