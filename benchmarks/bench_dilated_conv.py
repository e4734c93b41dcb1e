"""Lowering strategies for the trunk's DENSE dilated 3x3 convs.

bench_infer_parts.py puts the R101 trunk at ~57% MXU util over ~0.9
TFLOP of convs; the dilated 3x3s (layer3 d=2 x23, layer4 d=4 x3 at OS8
— reference: core/models/resnet.py:168-191 via
replace_stride_with_dilation) hold ~half those FLOPs. XLA-TPU lowers a
rhs_dilation conv through its generic conv emitter; this times three
value-identical reformulations against it at the exact trunk shapes
(640x1280 input -> 80x160 feature maps):

  native   : lax.conv_general_dilated(rhs_dilation=(d, d))
  shift9   : 9 shifted channel GEMMs accumulating in f32 — tap (i, j)
             contributes x_pad[.., i*d:, j*d:, :] @ W[i, j]; pure MXU
             dots, no conv emitter involved
  s2b      : space-to-batch — the d*d interleaved subgrids stack on the
             batch axis, one UNdilated 3x3/pad-1 conv, inverse
             interleave (exact for stride 1, pad d, dilation d)
  undil    : the same conv with d=1 (NOT value-identical — the
             speed-of-light comparator: same FLOPs, dense taps)

Measured (v5e-1, bf16, delta-of-20-iteration timing), ISOLATED op:

  layer3 (80,160,256)->256 d=2 : native 163 us, shift9 100 us,
                                 s2b    141 us, undil    96 us
  layer4 (80,160,512)->512 d=4 : native 456 us, shift9 356 us,
                                 s2b    391 us, undil   445 us
  (MXU ideal: 77 us / 307 us). Also head bottleneck (80,160,2560)->512
  d=1: native 2111 us vs shift9 1788; layer1/layer2 shapes 1.4-1.9x.

MEASURED NEGATIVE RESULT — the isolated wins do NOT transfer to the
full network (same harness, whole R101 trunk at 640x1280):

  trunk, native conv emitter : 8.01 ms/img
  trunk, shift9 everywhere   : 10.13 ms/img   (25% WORSE)
  trunk, s2b on dilated convs:  8.00 ms/img   (parity)

In isolation the benched input pool (~13 MB) and weights stay
VMEM-resident, so shift9's 9 dots re-read the input for free; inside
the trunk each block's input streams from HBM and the 9 dot operands
cost ~80 MB/block of re-reads (plus a materialized pad) — more than
the emitter inefficiency they remove. s2b keeps the emitter's input
streaming and lands exactly at parity: the emitter's dilation handling
was never the bottleneck in context. The lowering stays available as
``TPU.DENSE_CONV_MODE`` in {conv (default), shift9, s2b}; revisit only
with a Pallas kernel that tiles input reuse explicitly.
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


def native(w, x, d):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((d, d), (d, d)), rhs_dilation=(d, d),
        dimension_numbers=dn(x, w))


def shift9(w, x, d):
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)))
    acc = jnp.zeros((B, H, W, w.shape[-1]), jnp.float32)
    for i in range(3):
        for j in range(3):
            tap = xp[:, i * d:i * d + H, j * d:j * d + W, :]
            acc = acc + lax.dot_general(
                tap, w[i, j], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


def s2b(w, x, d):
    """Space-to-batch: y[:, i::d, j::d] = conv3x3_pad1(x[:, i::d, j::d])."""
    B, H, W, C = x.shape
    # (B, H/d, d, W/d, d, C) -> (d*d*B, H/d, W/d, C)
    g = x.reshape(B, H // d, d, W // d, d, C)
    g = g.transpose(2, 4, 0, 1, 3, 5).reshape(d * d * B, H // d, W // d, C)
    y = lax.conv_general_dilated(g, w, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=dn(g, w))
    y = y.reshape(d, d, B, H // d, W // d, w.shape[-1])
    return y.transpose(2, 3, 0, 4, 1, 5).reshape(B, H, W, w.shape[-1])


def undil(w, x, d):
    return lax.conv_general_dilated(x, w, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=dn(x, w))


def check_equal():
    """s2b and shift9 must match native exactly (f32, CPU-safe)."""
    import numpy as np
    rng = np.random.default_rng(0)
    for C, d in ((8, 2), (8, 4)):
        x = jnp.asarray(rng.normal(size=(1, 16, 24, C)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(3, 3, C, C)), jnp.float32)
        ref = np.asarray(native(w, x, d))
        for name, fn in (("shift9", shift9), ("s2b", s2b)):
            got = np.asarray(fn(w, x, d)).astype(np.float32)
            err = np.abs(got - ref).max()
            assert err < 1e-3, (name, d, err)
    print("value check ok (shift9, s2b == native)")


def pallas(w, x, d):
    from halo_tpu.ops import pallas_conv
    return pallas_conv.dilated_conv3x3(x, w, d)


def trunk_mode(mode: str):
    """Whole-R101-trunk per-image time with DENSE_CONV_MODE=``mode``."""
    from halo_tpu.config import get_default_cfg
    from halo_tpu.models import build_segmentor

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.DENSE_CONV_MODE = mode
    model = build_segmentor(cfg)
    xs = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 640, 1280, 3),
                           jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        xs[0], train=False)
    fe = model.feature_extractor
    fe_vars = {k: v["feature_extractor"] for k, v in variables.items()
               if "feature_extractor" in v}

    @jax.jit
    def run(v, xs, n):
        def body(i, acc):
            x = lax.dynamic_index_in_dim(xs, i % 4, 0, keepdims=False)
            feats = fe.apply(v, x, train=False)
            return acc + feats["out"].astype(jnp.float32)[0, 0, 0, 0]
        return lax.fori_loop(0, n, body, jnp.float32(0))

    return per_iter(run, fe_vars, xs)


def main():
    check_equal()
    key = jax.random.PRNGKey(0)
    shapes = (
        ("layer3 (80,160,256) d=2", 256, 2),
        ("layer4 (80,160,512) d=4", 512, 4),
    )
    from halo_tpu.ops import pallas_conv
    for label, C, d in shapes:
        xs = jax.random.normal(key, (2, 1, 80, 160, C), BF)
        w = jax.random.normal(key, (3, 3, C, C), BF) * 0.02
        flops = 2 * 80 * 160 * 9 * C * C
        print(f"{label}  (MXU ideal {flops / 197e12 * 1e6:.0f} us)")
        variants = [("native", native), ("shift9", shift9),
                    ("s2b", s2b), ("undil*", undil)]
        if pallas_conv.supports((1, 80, 160, C), (3, 3, C, C), d):
            variants.append(("pallas", pallas))
        else:
            print("  pallas  :  (unsupported at this shape)")
        for name, fn in variants:
            def one(wk, x, fn=fn):
                return fn(wk, x, d).astype(jnp.float32)[0, 0, 0, 0]
            t = per_iter(loop(one), w, xs)
            print(f"  {name:8s}: {t * 1e6:7.0f} us")

    print("full trunk @640x1280 (in-context):")
    for mode in ("conv", "pallas"):
        t = trunk_mode(mode)
        print(f"  {mode:8s}: {t * 1e3:7.2f} ms/img")


if __name__ == "__main__":
    print("devices:", jax.devices())
    main()
