"""Per-op decomposition of the DeepLab-v3+ head on the chip.

bench_infer_parts.py showed the head (ASPP+decoder+HFR+MLR) costs ~8.4 ms
of the 16.3 ms flagship forward at 640x1280 while holding only ~0.47 of
the model's ~1.4 TFLOPs (~28% MXU util vs the trunk's ~57%). This times
the head's building blocks in isolation to find the sink. Suspects: the
three dilated depthwise 3x3 convs on 2048 channels (XLA grouped-conv
lowering), the 3x3/2560->512 bottleneck GEMM, the stride-4 decoder pair,
and the full head apply.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
from jax import lax

SMALL, BIG = 2, 22
BF = jnp.bfloat16


def timed(fn, *args, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def per_iter(run, *args):
    float(run(*args, SMALL))
    return (timed(run, *args, BIG) - timed(run, *args, SMALL)) / (BIG - SMALL)


def loop(fn_one, pool=2):
    @jax.jit
    def run(w, xs, n):
        def body(i, acc):
            x = lax.dynamic_index_in_dim(xs, i % pool, 0, keepdims=False)
            return acc + fn_one(w, x)
        return lax.fori_loop(0, n, body, jnp.float32(0))
    return run


def dn(x, k):
    return lax.conv_dimension_numbers(x.shape, k.shape,
                                      ("NHWC", "HWIO", "NHWC"))


def main():
    key = jax.random.PRNGKey(0)
    # feature-res tensors for 640x1280 input at OS8
    xs_out = jax.random.normal(key, (2, 1, 80, 160, 2048), BF)
    xs_cat = jax.random.normal(key, (2, 1, 80, 160, 2560), BF)
    xs_dec = jax.random.normal(key, (2, 1, 160, 320, 560), BF)

    # (a) depthwise 3x3 dilation-6 on 2048ch (grouped conv, one branch)
    kdw = jax.random.normal(key, (3, 3, 1, 2048), BF) * 0.02

    def dw(w, x):
        y = lax.conv_general_dilated(
            x, w, (1, 1), ((6, 6), (6, 6)), rhs_dilation=(6, 6),
            dimension_numbers=dn(x, w), feature_group_count=2048)
        return y.astype(jnp.float32)[0, 0, 0, 0]
    t_dw = per_iter(loop(dw), kdw, xs_out)

    # (a2) same stencil as 9 shifted multiply-adds (VPU formulation)
    def dw_stencil(w, x):
        d = 6
        xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
        H, W = x.shape[1], x.shape[2]
        acc = jnp.zeros(x.shape, BF)
        for i in range(3):
            for j in range(3):
                acc = acc + xp[:, i * d:i * d + H, j * d:j * d + W, :] \
                    * w[i, j, 0]
        return acc.astype(jnp.float32)[0, 0, 0, 0]
    t_dws = per_iter(loop(dw_stencil), kdw, xs_out)

    # (b) pointwise 2048->512 (one ASPP branch GEMM)
    kpw = jax.random.normal(key, (1, 1, 2048, 512), BF) * 0.02

    def pw(w, x):
        y = lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                     dimension_numbers=dn(x, w))
        return y.astype(jnp.float32)[0, 0, 0, 0]
    t_pw = per_iter(loop(pw), kpw, xs_out)

    # (c) bottleneck 3x3 2560->512
    kbn = jax.random.normal(key, (3, 3, 2560, 512), BF) * 0.02

    def bn(w, x):
        y = lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=dn(x, w))
        return y.astype(jnp.float32)[0, 0, 0, 0]
    t_bn = per_iter(loop(bn), kbn, xs_cat)

    # (d) decoder separable pair at stride-4 res (560->512 then 512->512)
    kd1dw = jax.random.normal(key, (3, 3, 1, 560), BF) * 0.02
    kd1pw = jax.random.normal(key, (1, 1, 560, 512), BF) * 0.02
    kd2dw = jax.random.normal(key, (3, 3, 1, 512), BF) * 0.02
    kd2pw = jax.random.normal(key, (1, 1, 512, 512), BF) * 0.02

    def dec(ws, x):
        a, b, c, d = ws
        y = lax.conv_general_dilated(
            x, a, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn(x, a),
            feature_group_count=560)
        y = lax.conv_general_dilated(y, b, (1, 1), "VALID",
                                     dimension_numbers=dn(y, b))
        y = lax.conv_general_dilated(
            y, c, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn(y, c),
            feature_group_count=512)
        y = lax.conv_general_dilated(y, d, (1, 1), "VALID",
                                     dimension_numbers=dn(y, d))
        return y.astype(jnp.float32)[0, 0, 0, 0]
    t_dec = per_iter(loop(dec), (kd1dw, kd1pw, kd2dw, kd2pw), xs_dec)

    # (e) the full flagship head on fixed features
    from halo_tpu.config import get_default_cfg
    from halo_tpu.models import build_classifier

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    head = build_classifier(cfg)
    feats1 = {"low": jnp.zeros((1, 160, 320, 256), jnp.float32),
              "out": jnp.zeros((1, 80, 160, 2048), jnp.float32)}
    hv = head.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, feats1, train=False)
    feats_pool = {
        "low": jax.random.normal(key, (2, 1, 160, 320, 256), jnp.float32),
        "out": jax.random.normal(key, (2, 1, 80, 160, 2048), jnp.float32),
    }

    @jax.jit
    def head_run(hv, pool, n):
        def body(i, acc):
            f = {k: lax.dynamic_index_in_dim(v, i % 2, 0, keepdims=False)
                 for k, v in pool.items()}
            out, _ = head.apply(hv, f, size=(640, 1280), train=False)
            return acc + out.astype(jnp.float32)[0, 0, 0, 0]
        return lax.fori_loop(0, n, body, jnp.float32(0))
    t_head = per_iter(head_run, hv, feats_pool)

    # (f) stem: canonical 7x7/s2 C3->64 vs space-to-depth 4x4/s1 C12->64
    xs_img = jax.random.normal(key, (2, 1, 640, 1280, 3), jnp.float32)
    k7 = jax.random.normal(key, (7, 7, 3, 64), BF) * 0.02

    def stem7(w, x):
        y = lax.conv_general_dilated(x.astype(BF), w, (2, 2),
                                     ((3, 3), (3, 3)),
                                     dimension_numbers=dn(x, w))
        return y.astype(jnp.float32)[0, 0, 0, 0]
    t_s7 = per_iter(loop(stem7), k7, xs_img)

    import numpy as np
    k4 = np.zeros((4, 4, 12, 64), np.float32)
    k7n = np.asarray(k7, np.float32)
    for u in range(7):
        a, dy = (u + 1) // 2, (u + 1) % 2
        for v in range(7):
            b, dx = (v + 1) // 2, (v + 1) % 2
            k4[a, b, (dy * 2 + dx) * 3:(dy * 2 + dx + 1) * 3, :] = k7n[u, v]
    k4 = jnp.asarray(k4, BF)

    def stem_s2d(w, x):
        B, H, W, C = x.shape
        xp = jnp.pad(x.astype(BF), ((0, 0), (4, 4), (4, 4), (0, 0)))
        y = xp.reshape(B, (H + 8) // 2, 2, (W + 8) // 2, 2, C)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            B, (H + 8) // 2, (W + 8) // 2, 4 * C)
        o = lax.conv_general_dilated(y, w, (1, 1), "VALID",
                                     dimension_numbers=dn(y, w))
        return o.astype(jnp.float32)[0, 0, 0, 0]
    t_s2d = per_iter(loop(stem_s2d), k4, xs_img)

    print(f"dw 3x3 d6 2048ch grouped   : {t_dw * 1e3:7.2f} ms")
    print(f"dw 3x3 d6 2048ch stencil   : {t_dws * 1e3:7.2f} ms")
    print(f"pointwise 2048->512        : {t_pw * 1e3:7.2f} ms")
    print(f"bottleneck 3x3 2560->512   : {t_bn * 1e3:7.2f} ms")
    print(f"decoder sep pair @ s4      : {t_dec * 1e3:7.2f} ms")
    print(f"full head apply            : {t_head * 1e3:7.2f} ms")
    print(f"stem 7x7/s2 canonical      : {t_s7 * 1e3:7.2f} ms")
    print(f"stem 4x4/s1 space-to-depth : {t_s2d * 1e3:7.2f} ms")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
