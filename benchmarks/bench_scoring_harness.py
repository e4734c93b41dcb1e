"""Compare scoring-throughput harness formulations on the real chip.

The production acquisition sweep scores TPU.ACTIVE_BATCH maps per
compiled dispatch (region_selection.py), so the honest throughput number
is per-map time inside a batched program. bench.py's fori_loop-over-a-
pool formulation adds a dynamic-slice gather per iteration that may or
may not fuse; this script measures the variants side by side:

  A. fori_loop + dynamic_index pool (bench.py as shipped)
  B. vmapped batch of N distinct maps, one program
  C. single-map program, serially-dependent fori_loop (chain feedback)

Run: python benchmarks/bench_scoring_harness.py  (on the TPU chip)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from halo_tpu.active.scoring import floating_region_score

H, W, C, E = 1024, 2048, 19, 64
N = 6


def timed(fn, *args, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def score1(lg, em):
    s, _, _ = floating_region_score(lg, em, unc_type="entropy",
                                    pur_type="radius", size=3,
                                    num_classes=C, normalize=True)
    return s


def main(dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    logits = jax.random.normal(k1, (N, H, W, C), jnp.float32).astype(dtype)
    embed = (jax.random.normal(k2, (N, H, W, E), jnp.float32) * 0.5
             ).astype(dtype)

    # A: fori_loop + dynamic_index pool (current bench.py), LARGE trip
    # counts so the delta (~64 maps) dwarfs the relay's ~ms-scale timing
    # jitter that made small-N deltas unreliable (negative times seen at
    # N=6).
    @jax.jit
    def loop_pool(logits, embed, n):
        def body(i, acc):
            lg = jax.lax.dynamic_index_in_dim(logits, i % N, 0,
                                              keepdims=False)
            em = jax.lax.dynamic_index_in_dim(embed, i % N, 0,
                                              keepdims=False)
            return acc + score1(lg, em)[0, 0]
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    float(loop_pool(logits, embed, 1))
    t4 = timed(loop_pool, logits, embed, 4)
    t68 = timed(loop_pool, logits, embed, 68)
    a = (t68 - t4) / 64

    # (A dropped batched variant: a loop body that vmaps scoring over the
    # whole pool is loop-INVARIANT, so XLA hoists it and the loop times
    # nothing; any i-dependent reformulation (roll, gather, slice of a 2N
    # pool) adds a full-tensor copy per iteration that distorts the
    # bandwidth-bound measurement. Variant A already cycles N distinct
    # resident maps, which is production-faithful: scoring is per-map
    # independent in region_selection's batched dispatch.)
    b = float("nan")

    # C: serially-dependent chain on one resident map. The feedback must
    # reach BOTH inputs: with a logits-only carry XLA hoists the whole
    # (loop-invariant) radius stage out of the loop and the chain times
    # only the entropy half.
    @jax.jit
    def chain(lg0, em0, n):
        def body(i, carry):
            lg, em, acc = carry
            s = score1(lg, em)
            d = s[0, 0] * 1e-6
            return (lg.at[0, 0, 0].add(d.astype(lg.dtype)),
                    em.at[0, 0, 0].add(d.astype(em.dtype)), acc + s[0, 0])
        _, _, acc = jax.lax.fori_loop(0, n, body,
                                      (lg0, em0, jnp.float32(0)))
        return acc
    float(chain(logits[0], embed[0], 1))
    tc4 = timed(chain, logits[0], embed[0], 4)
    tc68 = timed(chain, logits[0], embed[0], 68)
    c = (tc68 - tc4) / 64

    # Stage decomposition (serial-chain formulation): entropy-only vs
    # radius-only vs full — checks each stage against its HBM roofline
    # (logits 2 passes ~160 MB bf16; embed 1 pass ~268 MB).
    def stage_chain(unc_type, pur_type):
        @jax.jit
        def chain(lg0, em0, n):
            def body(i, carry):
                lg, em, acc = carry
                s, imp, unc = floating_region_score(
                    lg, em, unc_type=unc_type, pur_type=pur_type, size=3,
                    num_classes=C, normalize=True)
                # consume imp and unc directly: with the 'none' types one
                # factor is a zeros/ones constant and XLA would fold the
                # product and DCE the other stage entirely. Feed back into
                # both inputs or the stage that ignores the carried one
                # is loop-invariant and gets hoisted (measures ~0).
                live = s[0, 0] + imp[1, 1] + unc[2, 2]
                d = (live * 1e-6)
                return (lg.at[0, 0, 0].add(d.astype(lg.dtype)),
                        em.at[0, 0, 0].add(d.astype(em.dtype)),
                        acc + live)
            _, _, acc = jax.lax.fori_loop(0, n, body,
                                          (lg0, em0, jnp.float32(0)))
            return acc
        float(chain(logits[0], embed[0], 1))
        t4 = timed(chain, logits[0], embed[0], 4)
        t68 = timed(chain, logits[0], embed[0], 68)
        return (t68 - t4) / 64

    t_ent = stage_chain("entropy", "none")
    t_rad = stage_chain("none", "radius")

    mpx = H * W / 1e6
    for name, t in [("A fori+pool", a), ("B vmap-batch", b),
                    ("C serial-chain", c), ("entropy-only", t_ent),
                    ("radius-only", t_rad)]:
        print(f"{name}: {t * 1e3:7.3f} ms/map  {mpx / t:7.1f} Mpx/s")


if __name__ == "__main__":
    print("devices:", jax.devices())
    print("== bfloat16 ==")
    main(jnp.bfloat16)
    print("== float32 ==")
    main(jnp.float32)
