"""Headline benchmark: acquisition-scoring throughput (Mpx/sec/chip).

Measures the HALO acquisition hot path at native Cityscapes resolution
(1024x2048): softmax -> windowed entropy -> hyperbolic radius -> normalize
-> score (reference: FloatingRegionScore.forward,
core/active/floating_region.py:129-217 — the per-image inner loop of
RegionSelection, SURVEY.md §3C hot loop #2).

Methodology: N serially-dependent scoring iterations run inside ONE
compiled program and the result is materialized to host, so the timing
counts real chip work and amortizes host/dispatch latency (which in this
environment includes a ~30 ms relay round-trip per sync that a production
TPU host does not pay). Per-map time = (T_N - T_1) / (N - 1).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference repo publishes no throughput numbers
(SURVEY.md §6), so the baseline is an analytic estimate of the PyTorch
scoring chain on an A100: dense softmax+entropy + box convs + float64
dist0 over a 2.1 Mpx x (19+64)-ch map — ~55 Mpx/s in eager PyTorch
(the f64 dist0 alone caps it: A100 non-tensor-core f64 is 9.7 TFLOPs and
the chain is memory/dispatch-bound). Treat vs_baseline as an estimate
until a reference A100 measurement lands (BASELINE.md note).
"""

import json
import time

import jax
import jax.numpy as jnp

from halo_tpu.active.scoring import floating_region_score

H, W, C, E = 1024, 2048, 19, 64
A100_BASELINE_MPX_S = 55.0
N_LONG = 64


def main():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    logits = jax.random.normal(k1, (H, W, C), jnp.float32)
    embed = jax.random.normal(k2, (H, W, E), jnp.float32) * 0.5

    @jax.jit
    def chain(logits, embed, n):
        def body(_, carry):
            lg, acc = carry
            s, _, _ = floating_region_score(
                lg, embed, unc_type="entropy", pur_type="radius", size=3,
                num_classes=C, normalize=True)
            # serial dependency: no iteration can be elided or overlapped
            lg = lg + s[..., None] * 1e-6
            return lg, acc + s[0, 0]
        _, acc = jax.lax.fori_loop(0, n, body, (logits, jnp.float32(0)))
        return acc

    float(chain(logits, embed, 1))  # compile + warm

    def timed(n):
        t0 = time.perf_counter()
        float(chain(logits, embed, n))  # host materialization = true sync
        return time.perf_counter() - t0

    t1 = min(timed(1) for _ in range(3))
    tn = min(timed(N_LONG) for _ in range(3))
    per_map = (tn - t1) / (N_LONG - 1)
    mpx_per_s = H * W / 1e6 / per_map

    print(json.dumps({
        "metric": "acquisition_scoring_throughput",
        "value": round(mpx_per_s, 1),
        "unit": "Mpx/sec/chip",
        "vs_baseline": round(mpx_per_s / A100_BASELINE_MPX_S, 2),
    }))


if __name__ == "__main__":
    main()
