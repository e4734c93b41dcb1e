"""Per-stage trunk backward split at production source shapes (B=2,
720x1280): forward vs input-grad chain vs weight grads, per ResNet-101
stage. Round-3 measurement with CONV_WGRAD=gemm (the default):

    layer1: fwd  5.29  +dgrad  1.74 (0.33x)  +wgrad  0.27 (0.05x)
    layer2: fwd  3.77  +dgrad  2.04 (0.54x)  +wgrad  0.10 (0.03x)
    layer3: fwd 11.79  +dgrad 10.54 (0.89x)  +wgrad 12.25 (1.04x)
    layer4: fwd  8.21  +dgrad  6.23 (0.76x)  +wgrad  3.95 (0.48x)

Every stage's dgrad and wgrad are at or below their forward-FLOP par
(dgrad+wgrad ~= 2x fwd would be par) — the backward is component-roofline
bound; no stage-level anomaly remains. (Before the GEMM wgrad, layer3/4
wgrad measured ~1.6x fwd.) layer1/2 absolute times are traffic/tiling
floors of the 64-128 channel convs (see the probe numbers in README.md),
not MXU-limited.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from flax import linen as nn
from halo_tpu.models.resnet import Bottleneck
from halo_tpu.models import layers as L

DT = jnp.bfloat16

class Stage(nn.Module):
    planes: int
    blocks: int
    strides: int
    dilation_first: int
    dilation_rest: int

    @nn.compact
    def __call__(self, x):
        for b in range(self.blocks):
            first = b == 0
            x = Bottleneck(
                planes=self.planes,
                strides=self.strides if first else 1,
                dilation=self.dilation_first if first else self.dilation_rest,
                groups=1, base_width=64,
                has_downsample=first,
                freeze_bn=True, train=True, dtype=DT,
                name=f"b{b}")(x)
        return x

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

# production shapes (post-stem), B=2 source batch 720x1280
CFGS = [
    ("layer1", Stage(64, 3, 1, 1, 1), (2, 180, 320, 64)),
    ("layer2", Stage(128, 4, 2, 1, 1), (2, 180, 320, 256)),
    ("layer3", Stage(256, 23, 1, 1, 2), (2, 90, 160, 512)),
    ("layer4", Stage(512, 3, 1, 2, 4), (2, 90, 160, 1024)),
]

for name, mod, shape in CFGS:
    x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    v = mod.init(jax.random.PRNGKey(1), x)

    def fwd(params, x):
        out = mod.apply({"params": params, "frozen": v["frozen"]}, x)
        return jnp.sum(out.astype(jnp.float32))

    f = jax.jit(fwd)
    gp = jax.jit(jax.grad(fwd))            # wrt params: dgrad chain (not 1st dx) + wgrads
    gx = jax.jit(jax.grad(fwd, argnums=1)) # wrt input: full dgrad chain, no wgrads
    t_f = timeit(f, v["params"], x)
    t_x = timeit(gx, v["params"], x)
    t_p = timeit(gp, v["params"], x)
    dg = t_x - t_f
    wg = t_p - t_x  # approx (t_p misses 1st-conv dx, ~small)
    print(f"{name}: fwd {t_f*1e3:6.2f}  +dgrad {dg*1e3:6.2f} ({dg/t_f:4.2f}x)"
          f"  +wgrad {wg*1e3:6.2f} ({wg/t_f:4.2f}x)   gp_total {t_p*1e3:6.2f}",
          flush=True)
