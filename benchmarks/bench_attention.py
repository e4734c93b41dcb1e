"""MiT efficient-attention: XLA einsum+softmax vs Pallas flash attention.

MiT-B4 at 640x1280 runs 4 stage shapes of spatial-reduction attention
(models/segformer.py:EfficientAttention); every stage reduces KV to
20x40=800 tokens. The XLA path materializes the (q_seq, 800) attention
matrix in HBM and re-reads it around the f32 softmax — at stage1
(q_seq=51200, 1 head) that is an 82 MB bf16 transient per block, and the
stage measures ~9% MXU util. The Pallas TPU flash kernel
(jax.experimental.pallas.ops.tpu.flash_attention) never materializes it;
KV is padded 800->896 with -inf bias masking (the kernel wants
128-multiple KV blocks) which leaves softmax exact.

Times each stage's attention op both ways with the fori-loop pool
pattern (bench.py methodology) and checks value agreement.

MEASURED NEGATIVE RESULT (v5e-1): flash is 5-13x SLOWER at every stage
shape (stage1 0.206 -> 1.615 ms, stage2 0.133 -> 0.624, stage3
0.042 -> 0.520, stage4 0.048 -> 0.209; values agree to 6e-3). With only
800 KV tokens the XLA path's attention matrix is small enough to stay
fusion-resident; the flash kernel's block scheduling dominates. The
attention core is ~2.95 ms of the 10.8 ms B4 encoder total — the floor
is small-dim GEMM tiling, not attention. Kept as the record so flash
attention is not retried at spatial-reduction shapes.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

SMALL, BIG = 2, 22

# (name, q_seq, kv_seq, heads, head_dim, blocks_in_b4)
STAGES = [
    ("stage1", 160 * 320, 20 * 40, 1, 64, 3),
    ("stage2", 80 * 160, 20 * 40, 2, 64, 8),
    ("stage3", 40 * 80, 20 * 40, 5, 64, 27),
    ("stage4", 20 * 40, 20 * 40, 8, 64, 3),
]


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter(fn, *args):
    float(fn(*args, SMALL))
    return (timed(fn, *args, BIG) - timed(fn, *args, SMALL)) / (BIG - SMALL)


def loop(fn_one, pool=4):
    @jax.jit
    def run(qs, ks, vs, n):
        def body(i, acc):
            q = jax.lax.dynamic_index_in_dim(qs, i % pool, 0, keepdims=False)
            k = jax.lax.dynamic_index_in_dim(ks, i % pool, 0, keepdims=False)
            v = jax.lax.dynamic_index_in_dim(vs, i % pool, 0, keepdims=False)
            return acc + fn_one(q, k, v)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def xla_attention(q, k, v):
    """The current EfficientAttention core (segformer.py:82-87):
    q,k,v (B, seq, heads, hd) -> (B, q_seq, heads, hd)."""
    hd = q.shape[-1]
    attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
        jnp.asarray(hd, jnp.float32)).astype(q.dtype)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def flash_attention_padded(q, k, v):
    """Flash kernel on (B, heads, seq, hd) with KV padded to a lane
    multiple and masked via the additive bias (exact softmax)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    hd = q.shape[-1]
    qt = jnp.swapaxes(q, 1, 2)  # (B, heads, q_seq, hd)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    kv = kt.shape[2]
    pad = (-kv) % 128
    if pad:
        kt = jnp.pad(kt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vt = jnp.pad(vt, ((0, 0), (0, 0), (0, pad), (0, 0)))
        ab = jnp.zeros((qt.shape[0], qt.shape[1], qt.shape[2], kv + pad),
                       jnp.float32)
        ab = ab.at[..., kv:].set(-1e30)
    else:
        ab = None
    out = fa.flash_attention(qt, kt, vt, ab=ab,
                             sm_scale=1.0 / float(np.sqrt(hd)))
    return jnp.swapaxes(out, 1, 2)


def main():
    for name, qs_, kvs, heads, hd, blocks in STAGES:
        key = jax.random.PRNGKey(0)
        kq, kk, kv_ = jax.random.split(key, 3)
        q = jax.random.normal(kq, (4, 1, qs_, heads, hd), jnp.bfloat16)
        k = jax.random.normal(kk, (4, 1, kvs, heads, hd), jnp.bfloat16)
        v = jax.random.normal(kv_, (4, 1, kvs, heads, hd), jnp.bfloat16)

        def xla_one(qq, kk2, vv):
            return xla_attention(qq, kk2, vv).astype(jnp.float32)[0, 0, 0, 0]

        t_x = per_iter(loop(xla_one), q, k, v)

        try:
            def fl_one(qq, kk2, vv):
                return flash_attention_padded(qq, kk2, vv).astype(
                    jnp.float32)[0, 0, 0, 0]

            t_f = per_iter(loop(fl_one), q, k, v)
            # value agreement
            a = np.asarray(xla_attention(q[0], k[0], v[0]), np.float32)
            b = np.asarray(flash_attention_padded(q[0], k[0], v[0]),
                           np.float32)
            err = np.max(np.abs(a - b))
            print(f"{name}: xla {t_x*1e3:7.3f} ms  flash {t_f*1e3:7.3f} ms "
                  f"(x{t_x/t_f:4.2f}, max|d|={err:.2e}, "
                  f"saved/img {(t_x-t_f)*blocks*1e3:6.2f} ms)")
        except Exception as e:
            print(f"{name}: xla {t_x*1e3:7.3f} ms  flash FAILED: "
                  f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
