"""Cross-entropy formulations at production shapes on the chip.

bench_train_parts.py leaves ~60 ms of the train forward unattributed
after the model forwards; the suspect is masked CE's per-pixel
``take_along_axis`` gather over (B,720,1280,19) f32 — TPU gathers along
the minor axis can lower badly. Compares the gather form against a
one-hot contraction of the same math.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax

from halo_tpu.losses import cross_entropy_loss


def timed(fn, *args, reps=5):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter(run, *args, small=2, big=22):
    float(run(*args, small))
    return (timed(run, *args, big) - timed(run, *args, small)) / (big - small)


def loop(fn):
    @jax.jit
    def run(logits, labels, n):
        def body(i, acc):
            lg = lax.dynamic_index_in_dim(logits, i % 2, 0, keepdims=False)
            lb = lax.dynamic_index_in_dim(labels, i % 2, 0, keepdims=False)
            return acc + fn(lg, lb)
        return lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def ce_onehot(logits, labels, ignore_index=255):
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    oh = jax.nn.one_hot(safe, num_classes, dtype=logp.dtype)
    nll = -jnp.sum(logp * oh, axis=-1)
    total = jnp.sum(jnp.where(valid, nll, 0.0))
    return total / jnp.maximum(jnp.sum(valid), 1.0)


def main():
    key = jax.random.PRNGKey(0)
    for (h, w) in ((720, 1280), (640, 1280)):
        logits = jax.random.normal(key, (2, 2, h, w, 19), jnp.float32)
        labels = jax.random.randint(key, (2, 2, h, w), 0, 19)
        labels = jnp.where(labels == 7, 255, labels)  # some ignored px
        t_g = per_iter(loop(cross_entropy_loss), logits, labels)
        t_o = per_iter(loop(ce_onehot), logits, labels)
        # parity check
        a = float(cross_entropy_loss(logits[0], labels[0]))
        b = float(ce_onehot(logits[0], labels[0]))
        print(f"{h}x{w}: gather {t_g * 1e3:6.2f} ms  one-hot "
              f"{t_o * 1e3:6.2f} ms  (values {a:.6f} vs {b:.6f})")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
