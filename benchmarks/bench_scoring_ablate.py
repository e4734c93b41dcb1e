"""Marginal stage costs of the production bf16 scoring chain by ablation."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.active import scoring

H, W, C, E = 1024, 2048, 19, 64
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
logits = (jax.random.normal(k1, (H, W, C), jnp.float32) * 3).astype(jnp.bfloat16)
embed = (jax.random.normal(k2, (H, W, E), jnp.float32) * 0.5).astype(jnp.bfloat16)

def score_from_pix(pe, rad):
    pix = {"pixel_entropy": pe, "radius": rad}
    return scoring._score_tail(pix, (H, W), unc_type="entropy",
                               pur_type="radius", size=3,
                               num_classes=C, K=100, normalize=True)[0]

def make_chain(mode):
    @jax.jit
    def chain(logits, embed, n):
        def body(i, carry):
            lg, acc = carry
            x32 = lg.astype(jnp.float32)
            if mode == "full":
                s, _, _ = scoring.floating_region_score(
                    lg, embed, unc_type="entropy", pur_type="radius",
                    size=3, num_classes=C, normalize=True)
            elif mode == "no_entropy":
                pe = jnp.full((H, W), 0.5, jnp.float32) + acc * 0.0
                s = score_from_pix(pe, scoring._radius_map(embed, 1.0, False))
            elif mode == "no_radius":
                rad = jnp.full((H, W), 0.5, jnp.float32) + acc * 0.0
                s = score_from_pix(scoring.entropy_from_logits(x32), rad)
            elif mode == "tail_only":
                pe = jnp.full((H, W), 0.5, jnp.float32) + acc * 0.0
                rad = jnp.full((H, W), 0.3, jnp.float32) + acc * 0.0
                s = score_from_pix(pe, rad)
            elif mode == "entropy_only":
                s = scoring.entropy_from_logits(x32)
            elif mode == "radius_only":
                s = scoring._radius_map(embed, 1.0, False)
            lg = lg + (s[..., None] * 1e-6).astype(lg.dtype)
            return lg, acc + s[0, 0].astype(jnp.float32)
        (_, acc) = jax.lax.fori_loop(0, n, body, (logits, jnp.float32(0)))
        return acc
    return chain

for mode in ("full", "no_entropy", "no_radius", "tail_only",
             "entropy_only", "radius_only"):
    try:
        ch = make_chain(mode)
        float(ch(logits, embed, 4))
        t0 = time.perf_counter(); float(ch(logits, embed, 4)); t4 = time.perf_counter() - t0
        t0 = time.perf_counter(); float(ch(logits, embed, 64)); t64 = time.perf_counter() - t0
        print("%-13s %7.3f ms/map" % (mode, (t64 - t4) / 60 * 1e3), flush=True)
    except Exception as e:
        print(mode, "FAILED:", repr(e), flush=True)
