import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import time
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.active.selection import (select_pixels_to_label,
                                       pallas_select_pixels_to_label)

H, W = 1024, 2048
n = math.ceil(H * W * 0.01 / 9)
score = jax.random.normal(jax.random.PRNGKey(0), (H, W), jnp.float32)
gt = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, 19)
am = jnp.full((H, W), 255, jnp.int32)
act = jnp.zeros((H, W), bool); sel = jnp.zeros((H, W), bool)
kw = dict(num_picks=n, active_radius=1, mask_radius=5)

t0 = time.time()
rp = pallas_select_pixels_to_label(score, am, gt, act, sel, **kw)
jax.block_until_ready(rp.active_mask)
print("pallas compile+run %.1fs" % (time.time() - t0))
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    rp = pallas_select_pixels_to_label(score, am, gt, act, sel, **kw)
    jax.block_until_ready(rp.active_mask)
    ts.append(time.perf_counter() - t0)
print("pallas steady %.1f ms (min %.1f)" % (1e3*np.mean(ts), 1e3*np.min(ts)))
print("picked", int(rp.num_picked))

t0 = time.time()
rx = select_pixels_to_label(score, am, gt, act, sel, **kw)
jax.block_until_ready(rx.active_mask)
print("xla compile+run %.1fs" % (time.time() - t0))
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    rx = select_pixels_to_label(score, am, gt, act, sel, **kw)
    jax.block_until_ready(rx.active_mask)
    ts.append(time.perf_counter() - t0)
print("xla steady %.1f ms" % (1e3*np.mean(ts)))

print("picks equal:", bool((rp.picks == rx.picks).all()))
print("masks equal:", bool((rp.active_mask == rx.active_mask).all()))
print("score equal:", bool((rp.score == rx.score).all()))
