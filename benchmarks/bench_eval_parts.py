"""Decompose the flip-TTA eval step (93 ms/img measured round 2).

The eval step (engine/steps.py:make_eval_step; reference inference,
core/train_learners.py:57-92) is: forward the [img, hflip(img)] pair at
640x1280 (logits at feature res), banded-resize to the native 1024x2048
label res, softmax, flip-average, argmax, then three per-class histograms
(intersection/union/target). A single forward is ~15 ms/img, so the pair
should be ~30 ms — where do the other ~60 go?

Suspects timed here:
  * the forward pair itself (batch-2 efficiency),
  * the post-forward tail (resize+softmax+avg+argmax) at native res,
  * the histogram trio — ``jnp.bincount`` lowers to scatter-add, which
    TPUs serialize; alternates measured: compare-accumulate (broadcast
    pred==class, sum over pixels — no scatter, reads the pred map once
    per pass) and a combined-key single bincount (one scatter instead of
    three).

Timing: fori_loop over an input pool with the index-dependent body
(bench.py methodology; invariant bodies get hoisted).

Measured (v5e-1): full eval 89.35 ms/img = forward pair 29.99 + tail
without histograms 4.38 + bincount trio 54.94. Compare-accumulate 0.06 ms
(fuses into the reduce), combined-key single bincount still 18.27 ms
(scatter itself is the problem). utils/metrics.py now uses
compare-accumulate; the full step re-measured 34.42 ms/img.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.ops.resize import resize_bilinear
from halo_tpu.utils.metrics import intersection_and_union

H, W = 640, 1280
LH, LW = 1024, 2048
K = 19
SMALL, BIG = 2, 22


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
    def run(v, xs, ys, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(xs, i % pool, 0, keepdims=False)
            y = jax.lax.dynamic_index_in_dim(ys, i % pool, 0, keepdims=False)
            return acc + fn_one(v, x, y)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def hist_compare_accumulate(pred, target, num_classes, ignore=255):
    """Value-identical to intersection_and_union, no scatter: broadcast
    compare against the class axis and sum over pixels (20 accumulators,
    one read pass per map on the VPU)."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore
    pred = jnp.where(valid, pred, num_classes)
    target = jnp.where(valid, target, num_classes)
    classes = jnp.arange(num_classes, dtype=pred.dtype)
    pm = pred[:, None] == classes
    tm = target[:, None] == classes
    inter = jnp.sum(pm & tm, axis=0)
    area_pred = jnp.sum(pm, axis=0)
    area_target = jnp.sum(tm, axis=0)
    union = area_pred + area_target - inter
    return (inter.astype(jnp.float32), union.astype(jnp.float32),
            area_target.astype(jnp.float32))


def hist_combined_key(pred, target, num_classes, ignore=255):
    """One bincount over key = target*(K+1)+pred; marginals give all
    three histograms (single scatter pass)."""
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore
    kk = num_classes + 1
    pred = jnp.where(valid, pred, num_classes)
    target = jnp.where(valid, target, num_classes)
    joint = jnp.bincount(target * kk + pred, length=kk * kk).reshape(kk, kk)
    inter = jnp.diagonal(joint)[:num_classes]
    area_pred = jnp.sum(joint, axis=0)[:num_classes]
    area_target = jnp.sum(joint, axis=1)[:num_classes]
    union = area_pred + area_target - inter
    return (inter.astype(jnp.float32), union.astype(jnp.float32),
            area_target.astype(jnp.float32))


def main():
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.MODEL.HYPER = True
    cfg.MODEL.HFR = True
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = build_segmentor(cfg)

    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (4, 1, H, W, 3), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (4, 1, LH, LW), 0, K,
                                jnp.int32)
    labels = labels.at[:, :, :64].set(255)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        imgs[0], train=False)

    def eval_one(v, img, label):
        x = jnp.concatenate([img, img[:, :, ::-1, :]], 0)
        out, _ = model.apply(v, x, train=False, size=None)
        out = resize_bilinear(out.astype(jnp.float32), (LH, LW))
        p = jax.nn.softmax(out, axis=-1)
        p = (p[:1] + p[1:, :, ::-1, :]) / 2.0
        pred = jnp.argmax(p, axis=-1)
        i, u, t = intersection_and_union(pred, label, K, 255)
        return i.sum() + u.sum() + t.sum()

    t_eval = per_iter(loop(eval_one), variables, imgs, labels)
    print(f"full eval step             : {t_eval * 1e3:7.2f} ms/img")

    def fwd_pair(v, img, label):
        x = jnp.concatenate([img, img[:, :, ::-1, :]], 0)
        out, _ = model.apply(v, x, train=False, size=None)
        return out.astype(jnp.float32)[0, 0, 0, 0]

    t_fwd = per_iter(loop(fwd_pair), variables, imgs, labels)
    print(f"forward pair only          : {t_fwd * 1e3:7.2f} ms/img")

    # tail from fixed feature-res logits
    fh, fw = H // 4, W // 4
    logits = jax.random.normal(jax.random.PRNGKey(2), (4, 2, fh, fw, K),
                               jnp.bfloat16)

    def tail(v, out, label):
        out = resize_bilinear(out.astype(jnp.float32), (LH, LW))
        p = jax.nn.softmax(out, axis=-1)
        p = (p[:1] + p[1:, :, ::-1, :]) / 2.0
        pred = jnp.argmax(p, axis=-1)
        i, u, t = intersection_and_union(pred, label, K, 255)
        return i.sum() + u.sum() + t.sum()

    t_tail = per_iter(loop(tail), {}, logits, labels)
    print(f"tail resize..argmax..hist  : {t_tail * 1e3:7.2f} ms/img")

    def tail_nohist(v, out, label):
        out = resize_bilinear(out.astype(jnp.float32), (LH, LW))
        p = jax.nn.softmax(out, axis=-1)
        p = (p[:1] + p[1:, :, ::-1, :]) / 2.0
        pred = jnp.argmax(p, axis=-1)
        return jnp.sum(pred).astype(jnp.float32) + label[0, 0, 0]

    t_tail_nh = per_iter(loop(tail_nohist), {}, logits, labels)
    print(f"tail without histograms    : {t_tail_nh * 1e3:7.2f} ms/img")

    preds = jax.random.randint(jax.random.PRNGKey(3), (4, 1, LH, LW), 0, K,
                               jnp.int32)
    for name, fn in (("bincount trio (current)", intersection_and_union),
                     ("compare-accumulate", hist_compare_accumulate),
                     ("combined-key bincount", hist_combined_key)):
        def hist_one(v, pred, label, fn=fn):
            i, u, t = fn(pred, label, K, 255)
            return i.sum() + u.sum() + t.sum()
        t_h = per_iter(loop(hist_one), {}, preds, labels)
        print(f"hist {name:24s}: {t_h * 1e3:7.2f} ms/img")

    # value check of the alternates
    i0, u0, t0 = intersection_and_union(preds[0], labels[0], K, 255)
    for fn in (hist_compare_accumulate, hist_combined_key):
        i1, u1, t1 = fn(preds[0], labels[0], K, 255)
        assert (i0 == i1).all() and (u0 == u1).all() and (t0 == t1).all(), fn


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
