"""Greedy selection timing + XLA/Pallas equality at production shapes.

Timing methodology (round 5 correction): the original version timed
single dispatches with ``jax.block_until_ready``, which can ack early
through this environment's remote-execution relay — it recorded
~0.1 ms for the Pallas kernel at 2331 picks, ~50x below truth. The
kernel is a sequential greedy loop (one argmax + column-cache stripe
update per pick; selection.py/pallas_select.py), so its real cost
scales with num_picks. This version unrolls K independent selects
inside one program, syncs on a scalar, and reports the K-delta
(bench.py:_timed_queued methodology — the relay's per-sync cost, which
is ~100s of ms when a full-res mask is materialized, cancels in the
delta).

Measured 2026-08-21 (idle v5e chip): Pallas VMEM kernel **9.98 ms** per
full-budget image (2331 picks @1024x2048, ~4.3 us/pick — sequential
pick-dependence is latency-bound, not bandwidth-bound) and **1.03 ms**
at a 0.1%-budget round (234 picks), so the cost is the pick loop, with
a small fixed score^T staging + column-max build (~0.1 ms). The XLA
column-cache fori_loop measures **38.1 ms** at 2331 picks (3.8x the
kernel). Reference comparison unchanged: the torch host loop is
~seconds/image (serial 11x11 suppression on host tensors,
core/active/build.py:27-64). Both device paths remain bit-identical
(asserted below).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import math
import time
from functools import partial

import jax, jax.numpy as jnp, numpy as np
from halo_tpu.active.selection import (select_pixels_to_label,
                                       pallas_select_pixels_to_label)

H, W = 1024, 2048
K_SMALL, K_BIG = 1, 3


def timed_queued(fn, *args, reps=5, inner=6):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        float(out)  # one true sync for the whole queue
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def per_select(select, scores, am, gt, act, sel, kw):
    def prog(ss, n):
        acc = jnp.float32(0)
        for i in range(n):  # unrolled: n independent selects, one program
            r = select(ss[i], am, gt, act, sel, **kw)
            acc = acc + r.num_picked + r.active_mask[0, 0]
        return acc

    f_s = jax.jit(partial(prog, n=K_SMALL))
    f_b = jax.jit(partial(prog, n=K_BIG))
    float(f_s(scores[:K_SMALL]))  # compile + warm
    float(f_b(scores))
    return (timed_queued(f_b, scores)
            - timed_queued(f_s, scores[:K_SMALL])) / (K_BIG - K_SMALL)


def main():
    scores = jax.random.normal(jax.random.PRNGKey(0), (K_BIG, H, W),
                               jnp.float32)
    gt = jax.random.randint(jax.random.PRNGKey(1), (H, W), 0, 19)
    am = jnp.full((H, W), 255, jnp.int32)
    act = jnp.zeros((H, W), bool)
    sel = jnp.zeros((H, W), bool)

    for budget in (0.001, 0.01):
        n = math.ceil(H * W * budget / 9)
        kw = dict(num_picks=n, active_radius=1, mask_radius=5)
        tp = per_select(pallas_select_pixels_to_label, scores, am, gt,
                        act, sel, kw)
        print(f"pallas  {n:5d} picks: {tp*1e3:6.2f} ms", flush=True)
        if budget == 0.01:
            tx = per_select(select_pixels_to_label, scores, am, gt,
                            act, sel, kw)
            print(f"xla     {n:5d} picks: {tx*1e3:6.2f} ms "
                  f"({tx/tp:.1f}x the kernel)", flush=True)

    # bit-equality at the full budget (the tests' contract, rechecked
    # here at bench shapes)
    kw = dict(num_picks=math.ceil(H * W * 0.01 / 9), active_radius=1,
              mask_radius=5)
    rp = pallas_select_pixels_to_label(scores[0], am, gt, act, sel, **kw)
    rx = select_pixels_to_label(scores[0], am, gt, act, sel, **kw)
    print("picks equal:", bool((np.asarray(rp.picks)
                                == np.asarray(rx.picks)).all()))
    print("masks equal:", bool((np.asarray(rp.active_mask)
                                == np.asarray(rx.active_mask)).all()))
    print("picked", int(rp.num_picked))


if __name__ == "__main__":
    main()
