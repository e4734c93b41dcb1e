import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.active.scoring import floating_region_score

H, W, C, E = 1024, 2048, 19, 64
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
logits = jax.random.normal(k1, (H, W, C), jnp.float32)
embed = jax.random.normal(k2, (H, W, E), jnp.float32) * 0.5

@jax.jit
def chain(logits, embed, n):
    def body(i, carry):
        lg, acc = carry
        s, _, _ = floating_region_score(lg, embed, unc_type="entropy",
                                        pur_type="radius", size=3,
                                        num_classes=C, normalize=True)
        # feed the score back so iterations are serially dependent
        lg = lg + s[..., None] * 1e-6
        return lg, acc + s[0, 0]
    (_, acc) = jax.lax.fori_loop(0, n, body, (logits, jnp.float32(0)))
    return acc

for n in (1, 1, 4, 16, 64):
    t0 = time.perf_counter()
    v = float(chain(logits, embed, n))
    dt = time.perf_counter() - t0
    print("n=%3d total %7.1f ms  (%7.2f ms/map)" % (n, dt*1e3, dt*1e3/n))
