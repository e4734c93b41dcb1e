"""Shared NN building blocks for the TPU model zoo.

Re-implements the normalization/init semantics the reference relies on
(reference: core/models/layers.py:5-23 for FrozenBatchNorm2d; torch default
inits for conv/linear layers) in Flax, channel-last (NHWC) — the layout XLA
tiles best onto the MXU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import conv_grads

# Use the shifted-MAC depthwise stencil in TRAIN mode too (via its custom
# VJP below). Set from cfg.TPU.STENCIL_TRAIN by models.build; eval mode
# always uses the stencil (it has no residuals to blow up).
STENCIL_TRAIN = True

# Lowering for the trunk/head dense stride-1 3x3 convs. Set from
# cfg.TPU.DENSE_CONV_MODE by models.build:
#   "conv"   — XLA's native conv emitter (default);
#   "shift9" — 9 shifted channel GEMMs (dense_stencil below). Wins 1.3-
#              1.6x in ISOLATION (VMEM-resident input) but loses ~25%
#              in the full trunk, where the 9 dots re-read the block
#              input from HBM (benchmarks/bench_dilated_conv.py);
#   "s2b"    — space-to-batch for dilated convs only: the d*d subgrids
#              stack on the batch axis around an UNdilated conv, keeping
#              the emitter's input streaming;
#   "pallas" — VMEM-resident Pallas kernel for the DILATED trunk convs
#              (ops/pallas_conv.py): the padded input block stays in
#              VMEM across all 9 tap GEMMs. Measured 2.3x SLOWER in the
#              full trunk (fusion barrier + unpipelined input DMA per
#              call — ops/pallas_conv.py docstring); kept opt-in.
#              Falls back to "conv" where unsupported.
DENSE_CONV_MODE = "conv"

# Route eligible convs (stride-1, ungrouped) through the int8 W8A8 eval
# path (QuantConv below). Set from cfg.TPU.QUANT_EVAL by models.build.
# Like the other lowering knobs this is read at init/trace time, but
# unlike them it also adds a `quant` variable collection to the model —
# a quantized build is a distinct model instance with its own variables.
QUANT_EVAL = False

# Weight-grad lowering for the dense stride-1 convs (orthogonal to the
# forward DENSE_CONV_MODE). Set from cfg.TPU.CONV_WGRAD by models.build:
#   "gemm" (default) — custom VJP keeping XLA's emitter for forward and
#          input-grad (both measured at their FLOP par) but computing the
#          weight grad as kh*kw shifted big-K GEMMs on the MXU. XLA's own
#          wgrad of the DILATED layer3/4 convs measures 1.6x their
#          forward (should be ~1x): ~19 ms/step excess at production
#          shapes (benchmarks/bench_bwd_parts.py, round-3 stage split);
#   "conv" — XLA's native wgrad (autodiff of the plain conv).
CONV_WGRAD = "gemm"

# ---------------------------------------------------------------------------
# Initializers matching torch semantics
# ---------------------------------------------------------------------------

# torch.nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu') — the
# backbone conv init (reference: core/models/resnet.py:153-154).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal")

# torch.nn.init.kaiming_normal_() defaults (fan_in, relu gain) — the head
# conv init (reference: core/models/classifier.py:318-327).
kaiming_normal_fan_in = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal")


def normal_init(stddev: float):
    return nn.initializers.normal(stddev=stddev)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    Flax Dense kernels are (in, out) so fan_in = shape[0].
    """
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_conv_bias_init(kernel_size: Sequence[int], in_channels: int):
    """torch.nn.Conv2d default bias init: U(±1/sqrt(fan_in))."""
    fan_in = in_channels * math.prod(int(k) for k in kernel_size)

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


# ---------------------------------------------------------------------------
# Normalization layers
# ---------------------------------------------------------------------------


class FrozenBatchNorm(nn.Module):
    """BatchNorm with statistics and affine params frozen as buffers.

    Equivalent to the reference's FrozenBatchNorm2d
    (core/models/layers.py:5-23): y = (x - mean) * rsqrt(var + eps) * w + b
    with all four tensors constant. Parameters live in the ``frozen``
    collection so they are invisible to the optimizer, and the whole layer
    folds into a per-channel scale+bias that XLA fuses into the preceding
    conv.
    """

    features: int
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        weight = self.variable(
            "frozen", "weight", nn.initializers.ones, None,
            (self.features,), jnp.float32).value
        bias = self.variable(
            "frozen", "bias", nn.initializers.zeros, None,
            (self.features,), jnp.float32).value
        mean = self.variable(
            "frozen", "running_mean", nn.initializers.zeros, None,
            (self.features,), jnp.float32).value
        var = self.variable(
            "frozen", "running_var", nn.initializers.ones, None,
            (self.features,), jnp.float32).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        dtype = self.dtype or x.dtype
        return x * scale.astype(dtype) + shift.astype(dtype)


class BatchNorm(nn.Module):
    """Train-time BatchNorm with torch semantics (momentum 0.1, eps 1e-5).

    Under jit+GSPMD with the batch axis sharded over the mesh, XLA computes
    the reduction over the *global* batch — i.e. sync-BN (the reference's
    Lightning ``sync_batchnorm=True``, train.py:129) falls out of SPMD for
    free. ``axis_name`` is additionally honored for shard_map/pmap callers.
    """

    features: int
    use_running_average: bool = False
    eps: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    dtype: Any = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = (self.use_running_average if use_running_average is None
               else use_running_average)
        norm = nn.BatchNorm(
            use_running_average=ura,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            dtype=self.dtype,
            axis_name=self.axis_name,
            name="bn")
        return norm(x)


def make_norm(freeze_bn: bool, features: int, dtype=None, name=None,
              train: bool = True, axis_name: Optional[str] = None):
    """Norm-layer factory mirroring build_classifier's bn_layer switch
    (reference: core/models/build.py:36-39)."""
    if freeze_bn:
        return FrozenBatchNorm(features, dtype=dtype, name=name)
    return BatchNorm(features, use_running_average=not train, dtype=dtype,
                     axis_name=axis_name, name=name)


# ---------------------------------------------------------------------------
# Conv blocks
# ---------------------------------------------------------------------------


def _stencil_fwd_impl(x, k, padding, dilation):
    """Shifted-MAC depthwise conv (stride 1): the forward loop shared by
    the primal and the custom-VJP wrapper. x: (B, H, W, C), k: (kh, kw, C)
    in the compute dtype."""
    kh, kw = k.shape[0], k.shape[1]
    (ph0, ph1), (pw0, pw1) = padding
    dh, dw = dilation
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    ho = x.shape[1] + ph0 + ph1 - dh * (kh - 1)
    wo = x.shape[2] + pw0 + pw1 - dw * (kw - 1)
    acc = jnp.zeros(x.shape[:1] + (ho, wo, x.shape[3]), x.dtype)
    for i in range(kh):
        for j in range(kw):
            acc = acc + xp[:, i * dh:i * dh + ho, j * dw:j * dw + wo, :] \
                * k[i, j]
    return acc


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def depthwise_stencil(x, k, padding, dilation):
    """Depthwise conv (stride 1, no bias) with a hand-written VJP.

    Plain autodiff of the shifted-MAC loop saves a padded near-full-map
    residual PER TAP (kh*kw of them), which OOM'd the v5e train step at
    production shapes (benchmarks/README.md round-2 note) — that is why
    the stencil used to be eval-only. This VJP saves exactly (x, k),
    the same residual footprint as the grouped conv, and computes:

      * dx: the transposed stencil — g padded by d*(k-1)-p and swept by
        the FLIPPED kernel; another pure shifted-MAC loop, no grouped
        conv anywhere;
      * dk[i,j,c]: per-tap contraction sum_{b,h,w} x_pad[.. + i*dh, ..]
        * g, accumulated in f32 (kh*kw fused map-reduces).
    """
    return _stencil_fwd_impl(x, k, padding, dilation)


def _stencil_vjp_fwd(x, k, padding, dilation):
    return _stencil_fwd_impl(x, k, padding, dilation), (x, k)


def _stencil_vjp_bwd(padding, dilation, res, g):
    x, k = res
    kh, kw, _c = k.shape
    (ph0, ph1), (pw0, pw1) = padding
    dh, dw = dilation
    # dx = g (padded with the transposed-conv margins) correlated with
    # the flipped taps: dx[p,q,c] = sum_{i,j} g[p+ph0-i*dh, q+pw0-j*dw] *
    # k[i,j,c], re-indexed so every slice start is non-negative.
    flip = k[::-1, ::-1]
    dx = _stencil_fwd_impl(
        g, flip,
        ((dh * (kh - 1) - ph0, dh * (kh - 1) - ph1),
         (dw * (kw - 1) - pw0, dw * (kw - 1) - pw1)),
        dilation)
    # dk: one fused multiply+reduce per tap; accumulate in at least f32
    # (f64 cotangents stay f64 so CPU x64 goldens stay exact, matching
    # conv_grads.wgrad_taps' promotion policy).
    acc_dt = jnp.promote_types(g.dtype, jnp.float32)
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    ho, wo = g.shape[1], g.shape[2]
    gf = g.astype(acc_dt)
    taps = [
        jnp.sum(xp[:, i * dh:i * dh + ho, j * dw:j * dw + wo, :]
                .astype(acc_dt) * gf, axis=(0, 1, 2))
        for i in range(kh) for j in range(kw)
    ]
    dk = jnp.stack(taps).reshape(kh, kw, -1).astype(k.dtype)
    return dx.astype(x.dtype), dk


depthwise_stencil.defvjp(_stencil_vjp_fwd, _stencil_vjp_bwd)


def _dense_stencil_fwd_impl(x, k, padding, dilation):
    """DENSE conv (stride 1) as kh*kw shifted channel GEMMs. x: (B, H, W,
    Cin), k: (kh, kw, Cin, Cout). Tap (i, j) contributes
    x_pad[:, i*dh:, j*dw:, :] @ k[i, j]; accumulation in f32 on the MXU.

    In ISOLATION this beats XLA's conv emitter 1.3-1.6x on the trunk
    shapes (v5e: layer3 d=2 163 us native vs 100 us, MXU ideal 77);
    inside the full trunk it measures 25% SLOWER — the 9 dot operands
    re-read the block input from HBM (~80 MB/block) once VMEM no longer
    holds it, costing more than the emitter inefficiency removed. Both
    measurements recorded in benchmarks/bench_dilated_conv.py; hence
    DENSE_CONV_MODE defaults to "conv" and this lowering is opt-in.
    """
    kh, kw = k.shape[0], k.shape[1]
    (ph0, ph1), (pw0, pw1) = padding
    dh, dw = dilation
    xp = jnp.pad(x, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0)))
    ho = x.shape[1] + ph0 + ph1 - dh * (kh - 1)
    wo = x.shape[2] + pw0 + pw1 - dw * (kw - 1)
    acc = jnp.zeros((x.shape[0], ho, wo, k.shape[-1]), jnp.float32)
    for i in range(kh):
        for j in range(kw):
            tap = xp[:, i * dh:i * dh + ho, j * dw:j * dw + wo, :]
            acc = acc + jax.lax.dot_general(
                tap, k[i, j], (((3,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    return acc.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def dense_stencil(x, k, padding, dilation):
    """Dense stride-1 conv as shifted GEMMs, with a hand-written VJP.

    Plain autodiff would keep each tap slice (kh*kw near-full copies of
    x_pad) as a dot residual — the same blow-up that made the depthwise
    stencil eval-only before its VJP. This saves exactly (x, k) and
    computes both grads as more shifted GEMMs:

      * dx: the transposed stencil — g swept by the FLIPPED, (Cout, Cin)-
        transposed kernel with margins d*(k-1)-p (>= 0 whenever
        p <= d*(k-1), true for every torch-style 'same' conv here);
      * dk[i, j] = tap^T @ g contracting over (B, H, W) — a big-K GEMM
        per tap, f32 accumulation.
    """
    return _dense_stencil_fwd_impl(x, k, padding, dilation)


def _dense_vjp_fwd(x, k, padding, dilation):
    return _dense_stencil_fwd_impl(x, k, padding, dilation), (x, k)


def _dense_vjp_bwd(padding, dilation, res, g):
    x, k = res
    kh, kw = k.shape[0], k.shape[1]
    (ph0, ph1), (pw0, pw1) = padding
    dh, dw = dilation
    # dx[u, v, c] = sum_{i,j,o} g[u + p - i*d, v + p - j*d, o] k[i,j,c,o]
    # == the forward stencil of g with the flipped, transposed kernel and
    # transposed-conv margins.
    kT = jnp.swapaxes(k, 2, 3)[::-1, ::-1]
    dx = _dense_stencil_fwd_impl(
        g, kT,
        ((dh * (kh - 1) - ph0, dh * (kh - 1) - ph1),
         (dw * (kw - 1) - pw0, dw * (kw - 1) - pw1)),
        dilation)
    dk = conv_grads.wgrad_taps(x, g, padding, dilation, kh, kw)
    return dx.astype(x.dtype), dk.astype(k.dtype)


dense_stencil.defvjp(_dense_vjp_fwd, _dense_vjp_bwd)


_CONV_DN = ("NHWC", "HWIO", "NHWC")


def _native_conv_impl(x, k, padding, dilation):
    """Stride-1 dense conv through XLA's native emitter — bit-identical
    to flax nn.Conv's lax call at these settings."""
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, rhs_dilation=dilation,
        dimension_numbers=_CONV_DN)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def native_conv_gemm_wgrad(x, k, padding, dilation):
    """XLA-emitter conv with a GEMM weight-grad (CONV_WGRAD='gemm').

    Forward and input-grad stay on XLA's conv emitter — both measured at
    their FLOP par in the trunk (dx 0.9-1.1x fwd per stage). The weight
    grad is the mix-and-match piece: XLA lowers the wgrad of the DILATED
    stride-1 convs at 1.6x their forward cost (layer3/4 stage split,
    benchmarks/bench_bwd_parts.py), while the same contraction as kh*kw
    shifted big-K GEMMs (contract over B*Ho*Wo on the MXU, f32
    accumulation) runs at par — recovering ~19 ms of the production
    source_target step. Residuals are exactly (x, k), the same footprint
    as plain autodiff."""
    return _native_conv_impl(x, k, padding, dilation)


def _native_gemm_vjp_fwd(x, k, padding, dilation):
    return _native_conv_impl(x, k, padding, dilation), (x, k)


def _native_gemm_vjp_bwd(padding, dilation, res, g):
    x, k = res
    kh, kw = k.shape[0], k.shape[1]
    (ph0, ph1), (pw0, pw1) = padding
    dh, dw = dilation
    # dx: the standard transposed-conv identity on the SAME emitter XLA's
    # autodiff uses (flipped, channel-transposed kernel, margins
    # d*(k-1)-p; valid whenever p <= d*(k-1), guaranteed by eligibility).
    kT = jnp.swapaxes(k, 2, 3)[::-1, ::-1]
    dx = jax.lax.conv_general_dilated(
        g, kT, (1, 1),
        ((dh * (kh - 1) - ph0, dh * (kh - 1) - ph1),
         (dw * (kw - 1) - pw0, dw * (kw - 1) - pw1)),
        rhs_dilation=dilation, dimension_numbers=_CONV_DN)
    dk = conv_grads.wgrad_taps(x, g, padding, dilation, kh, kw)
    return dx.astype(x.dtype), dk.astype(k.dtype)


native_conv_gemm_wgrad.defvjp(_native_gemm_vjp_fwd, _native_gemm_vjp_bwd)


def gemm_wgrad_eligible(kernel_size, strides, padding, dilation,
                        groups: int) -> bool:
    """Static eligibility for the GEMM-wgrad lowering: stride 1,
    ungrouped, numeric padding within the transposed-conv margin bound
    p <= d*(k-1) (every torch-style 'same' conv in the trunk/head)."""
    if CONV_WGRAD != "gemm":
        return False
    if groups != 1 or tuple(strides) != (1, 1):
        return False
    return pad_within_margin(kernel_size, padding, dilation)


class GemmWgradConv(nn.Module):
    """Dense stride-1 conv with the GEMM weight-grad VJP; param layout
    identical to flax ``nn.Conv`` ((kh, kw, Cin, Cout) under ``kernel``),
    so checkpoints and torch imports are unaffected. Forward values are
    bit-identical to nn.Conv (same emitter call)."""

    features: int
    kernel_size: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Any = None
    kernel_init: Callable = kaiming_normal_fan_in
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        dt = self.dtype or x.dtype
        y = native_conv_gemm_wgrad(x.astype(dt), kernel.astype(dt),
                                   tuple(map(tuple, self.padding)),
                                   tuple(self.dilation))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


# Minimum per-image output positions (Ho*Wo) for a STRIDED conv to take
# the int8 path at eval (decided per trace inside QuantConv; the variable
# structure stays a function of architecture constants only). Measured on
# v5e (benchmarks/bench_int8_strided.py): 3200 positions pay 1.46-1.52x
# (resnet layer2 transitions, MiT pe3), 800 positions lose 0.89-1.05x
# (MiT pe4 and the k=s SR-KV convs — overhead dominates the small GEMM).
_MIN_STRIDED_POSITIONS = 2048


def quant_eligible(strides, groups: int, in_features=None) -> bool:
    """Static eligibility for the int8 W8A8 eval lowering (decides the
    QuantConv dispatch, hence the variable structure — so it may depend
    only on architecture constants, never on input spatial dims):

      * stride-1 ungrouped convs — the families the MXU double-rate s8
        path was originally measured on (benchmarks/bench_int8.py);
      * STRIDED ungrouped convs with a wide input (Cin >= 128), measured
        at 1.46-1.52x in benchmarks/bench_int8_strided.py (resnet layer2
        3x3 s2 / 1x1 s2 downsample, MiT pe3) — callers pass
        ``in_features``; narrow inputs underfill the MXU lanes (Cin=64
        pe2 measured 0.93x, the Cin=3 stem 1.02x) and stay float. The
        small-output-grid losers (pe4, SR-KV) are excluded per trace by
        _MIN_STRIDED_POSITIONS inside QuantConv.

    Depthwise convs (VPU stencil) and every logits/embedding-producing
    conv stay float (their call sites never dispatch here)."""
    if not QUANT_EVAL or groups != 1:
        return False
    if tuple(strides) == (1, 1):
        return True
    return in_features is not None and in_features >= 128


class QuantConv(nn.Module):
    """Drop-in ``nn.Conv`` with an int8 W8A8 eval path (TPU.QUANT_EVAL).

    Param layout is identical to flax ``nn.Conv`` ((kh, kw, Cin, Cout)
    under ``kernel`` plus optional ``bias``), so checkpoints and torch
    imports are unaffected. Per-layer quantization state lives in the
    ``quant`` collection: ``amax`` (running activation absmax, scalar),
    ``w_int8``/``w_scale`` (per-output-channel symmetric weights frozen
    at calibration time, so inference never re-reads the f32 kernels).

    Three modes, chosen at trace time:
      * ``train=True``   — float conv via the XLA emitter (bit-identical
        to ``nn.Conv``); training a quantized build works but skips the
        GEMM-wgrad lowering (quantized builds are for serving).
      * ``quant`` collection mutable — CALIBRATION: float conv, plus
        ``amax = max(amax, |x|_max)`` and a weight-quantization snapshot
        (ops/quant.calibrate drives this).
      * otherwise (eval) — int8: activations quantize against ``amax``
        in the producer's epilogue, the conv accumulates int32 on the
        MXU's double-rate s8 path, and the f32 dequant + bias cast back
        to the compute dtype so BN/ReLU fuse as usual.

    Bias stays float: it adds AFTER dequantization, exactly as in the
    float path.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    train: bool = True
    dtype: Any = None
    kernel_init: Callable = kaiming_normal_fan_in
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        from ..ops import quant

        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features), jnp.float32)
        amax = self.variable(
            "quant", "amax", lambda: jnp.zeros((), jnp.float32))
        w_int8 = self.variable(
            "quant", "w_int8",
            lambda: jnp.zeros((kh, kw, x.shape[-1], self.features),
                              jnp.int8))
        w_scale = self.variable(
            "quant", "w_scale",
            lambda: jnp.ones((self.features,), jnp.float32))
        calibrating = self.is_mutable_collection("quant")
        dt = self.dtype if self.dtype is not None else \
            jnp.promote_types(x.dtype, jnp.float32)

        pad = self.padding
        if not isinstance(pad, str):
            pad = tuple(map(tuple, pad))
        # Strided convs only pay for int8 with enough output positions to
        # fill the MXU pipeline (bench_int8_strided.py); below the
        # threshold this trace computes the exact float conv instead.
        # Per-trace (shapes are static under jit), NOT per-build: the
        # variable structure above stays resolution-independent.
        sh, sw = self.strides
        out_positions = (-(-x.shape[1] // sh)) * (-(-x.shape[2] // sw))
        small_strided = ((sh, sw) != (1, 1)
                         and out_positions < _MIN_STRIDED_POSITIONS)
        if self.train or calibrating or small_strided:
            y = jax.lax.conv_general_dilated(
                x.astype(dt), kernel.astype(dt), self.strides, pad,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=_CONV_DN)
            if calibrating and not self.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
                w_int8.value, w_scale.value = quant.quantize_weight(kernel)
        else:
            y = quant.int8_conv(
                x, w_int8.value, w_scale.value, amax.value, self.strides,
                pad, self.kernel_dilation).astype(dt)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 W8A8 eval path (TPU.QUANT_EVAL).

    The transformer-family counterpart of QuantConv, same contract:
    param layout identical to flax ``nn.Dense`` ((Cin, Cout) ``kernel``
    plus optional ``bias``) so checkpoints and torch imports are
    unaffected; quantization state (``amax``, ``w_int8``, ``w_scale``)
    lives in the ``quant`` collection; three trace-time modes (train ->
    float dot, calibrating -> float dot + absmax/weight snapshot, eval ->
    s8 x s8 -> s32 on the MXU's double-rate path, f32 dequant).

    Hardware premise measured per MiT GEMM shape in
    benchmarks/bench_int8_mit.py — the small-dim transformer GEMMs are
    traffic-bound, so int8's halved bytes pay even where MXU utilization
    is far below peak... EXCEPT below ``min_cin`` input channels, where a
    K<128 contraction underfills the MXU's lanes and the activation-
    quantize epilogue costs more than the GEMM saves (measured 0.87x at
    Cin=64). Narrow layers fall back to the plain float dense, with no
    ``quant`` variables (the input width is static, so the variable
    structure stays deterministic per build).
    """

    features: int
    use_bias: bool = True
    train: bool = True
    dtype: Any = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    min_cin: int = 128

    @nn.compact
    def __call__(self, x):
        from ..ops import quant

        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), jnp.float32)
        if x.shape[-1] < self.min_cin:
            dt = self.dtype if self.dtype is not None else \
                jnp.promote_types(x.dtype, jnp.float32)
            y = jnp.dot(x.astype(dt), kernel.astype(dt))
            if self.use_bias:
                bias = self.param("bias", self.bias_init,
                                  (self.features,), jnp.float32)
                y = y + bias.astype(y.dtype)
            return y
        amax = self.variable(
            "quant", "amax", lambda: jnp.zeros((), jnp.float32))
        w_int8 = self.variable(
            "quant", "w_int8",
            lambda: jnp.zeros((x.shape[-1], self.features), jnp.int8))
        w_scale = self.variable(
            "quant", "w_scale",
            lambda: jnp.ones((self.features,), jnp.float32))
        calibrating = self.is_mutable_collection("quant")
        # dtype=None matches flax promote_dtype semantics (common dtype of
        # the input and the f32 params), keeping the float paths
        # bit-identical to the nn.Dense/nn.Conv the float build uses.
        dt = self.dtype if self.dtype is not None else \
            jnp.promote_types(x.dtype, jnp.float32)

        if self.train or calibrating:
            y = jnp.dot(x.astype(dt), kernel.astype(dt))
            if calibrating and not self.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32))
                w_int8.value, w_scale.value = quant.quantize_weight(kernel)
        else:
            y = quant.int8_dense(
                x, w_int8.value, w_scale.value, amax.value).astype(dt)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def make_dense(features, use_bias=True, train=True, dtype=None,
               kernel_init=nn.initializers.lecun_normal(),
               bias_init=nn.initializers.zeros, name=None):
    """``nn.Dense``, or ``QuantDense`` when the int8 eval path is on.

    Dense layers have no stride/group axis, so eligibility is just the
    knob — call sites keep logits/embedding producers on plain
    ``nn.Dense`` themselves (the standard last-layer PTQ exclusion)."""
    if QUANT_EVAL:
        return QuantDense(features, use_bias=use_bias, train=train,
                          dtype=dtype, kernel_init=kernel_init,
                          bias_init=bias_init, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    kernel_init=kernel_init, bias_init=bias_init, name=name)


def make_conv(features, kernel_size, strides=(1, 1), padding="SAME",
              dilation=(1, 1), groups: int = 1, use_bias: bool = False,
              train: bool = True, dtype=None,
              kernel_init=kaiming_normal_fan_in,
              bias_init=nn.initializers.zeros, name=None,
              in_features=None):
    """``nn.Conv``, or ``QuantConv`` when the int8 eval path is on and
    the conv is eligible (quant_eligible). Shared by every call site so
    the eligibility rule cannot drift. ``in_features`` (the architecture
    constant, e.g. ``x.shape[-1]`` at the call site) unlocks the strided
    families; without it strided convs stay float."""
    if quant_eligible(strides, groups, in_features):
        return QuantConv(
            features, kernel_size, strides=strides, padding=padding,
            kernel_dilation=dilation, use_bias=use_bias, train=train,
            dtype=dtype, kernel_init=kernel_init, bias_init=bias_init,
            name=name)
    return nn.Conv(
        features, kernel_size, strides=strides, padding=padding,
        kernel_dilation=dilation, feature_group_count=groups,
        use_bias=use_bias, dtype=dtype, kernel_init=kernel_init,
        bias_init=bias_init, name=name)


def space_to_batch_conv(x, conv_apply, d: int):
    """Dilated stride-1 conv via space-to-batch: the d*d interleaved
    subgrids stack on the batch axis, ``conv_apply`` runs UNdilated with
    pad 1 on each, and the outputs re-interleave. Exact for stride 1,
    padding d, dilation d (value check in benchmarks/bench_dilated_conv
    .py). H and W must divide by d (true trunk-wide: 80/160 with d in
    {2, 4})."""
    B, H, W, C = x.shape
    g = x.reshape(B, H // d, d, W // d, d, C)
    g = g.transpose(2, 4, 0, 1, 3, 5).reshape(d * d * B, H // d, W // d, C)
    y = conv_apply(g)
    Co = y.shape[-1]
    y = y.reshape(d, d, B, H // d, W // d, Co)
    return y.transpose(2, 3, 0, 4, 1, 5).reshape(B, H, W, Co)


def pad_within_margin(kernel_size, padding, dilation) -> bool:
    """Numeric padding within the transposed-conv margin bound
    p <= d*(k-1) — the dx eligibility every stencil-family custom VJP
    needs (their dx is a forward pass with margins d*(k-1)-p, which
    must be non-negative). Shared by all the eligibility predicates so
    the bound cannot drift between copies."""
    if not isinstance(padding, (tuple, list)):
        return False
    try:
        pads = tuple(map(tuple, padding))
    except TypeError:
        return False
    return all(max(p0, p1) <= d * (kk - 1)
               for (p0, p1), d, kk in zip(pads, dilation, kernel_size))


def dense_stencil_eligible(kernel_size, strides, padding, dilation,
                           groups: int, mode: str = None) -> bool:
    """Static eligibility for the dense shifted-GEMM lowering: stride 1,
    ungrouped, numeric padding within the transposed-conv margin bound
    p <= d*(k-1) the VJP needs."""
    if (mode if mode is not None else DENSE_CONV_MODE) != "shift9":
        return False
    if groups != 1 or tuple(strides) != (1, 1):
        return False
    return pad_within_margin(kernel_size, padding, dilation)


class DenseStencilConv(nn.Module):
    """Dense stride-1 conv via dense_stencil; param layout identical to
    flax ``nn.Conv`` ((kh, kw, Cin, Cout) under ``kernel`` plus optional
    ``bias``), so checkpoints and torch imports are unaffected."""

    features: int
    kernel_size: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = False
    dtype: Any = None
    kernel_init: Callable = kaiming_normal_fan_in
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        dt = self.dtype or x.dtype
        y = dense_stencil(x.astype(dt), kernel.astype(dt),
                          tuple(map(tuple, self.padding)),
                          tuple(self.dilation))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(dt)
        return y


def pallas_conv_eligible(x_shape, cout: int, strides, dilation,
                         groups: int, itemsize: int = 2) -> bool:
    """Static eligibility for the Pallas VMEM-resident dilated 3x3
    lowering (DENSE_CONV_MODE == "pallas"): dilated stride-1 ungrouped
    conv whose padded input block fits VMEM at the compute dtype's
    ``itemsize``, on a TPU backend (or under the interpreter for
    tests)."""
    if DENSE_CONV_MODE != "pallas":
        return False
    if groups != 1 or tuple(strides) != (1, 1):
        return False
    d = tuple(dilation)
    if d[0] != d[1] or d[0] < 2:
        return False
    from ..ops import pallas_conv
    if not (jax.default_backend() == "tpu" or pallas_conv.INTERPRET):
        return False
    return pallas_conv.supports(
        tuple(x_shape), (3, 3, int(x_shape[-1]), int(cout)), d[0],
        itemsize)


class PallasDilatedConv(nn.Module):
    """Dilated 3x3 stride-1 conv via the Pallas VMEM-resident kernel
    (ops/pallas_conv.py). Param layout identical to flax ``nn.Conv``
    ((3, 3, Cin, Cout) under ``kernel``), so checkpoints and torch
    imports are unaffected. Train-safe: the kernel carries a custom VJP
    (dx is the same kernel with the flipped transposed weights, dk is 9
    XLA contractions; residuals (x, k) only)."""

    features: int
    dilation: int
    dtype: Any = None
    kernel_init: Callable = kaiming_normal_fan_in

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_conv import dilated_conv3x3
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        dt = self.dtype or x.dtype
        return dilated_conv3x3(x.astype(dt), kernel.astype(dt),
                               int(self.dilation))


class _DepthwiseStencil(nn.Module):
    """Depthwise conv as kh*kw shifted multiply-adds (stride 1, no bias).

    XLA lowers ``feature_group_count=C`` convs through a grouped-conv path
    that measured ~35% slower than this explicit stencil on v5e (0.63 vs
    0.47 ms for 3x3 d6 on (80,160,2048) bf16 — benchmarks/
    bench_head_parts.py); end-to-end the flagship forward went 16.4 ->
    14.9 ms/img (+9% img/s, bench_infer_batch.py). The stencil is the
    same sums reassociated, computed entirely in the compute dtype (an
    f32 accumulator variant measured SLOWER end-to-end than the grouped
    conv it replaced — conversion traffic ate the win; in float32 compute
    mode, e.g. the CPU test suite, accumulation is f32 regardless). Param
    layout is identical to flax's grouped ``nn.Conv`` ((kh, kw, 1, C)
    under ``conv/kernel``), so checkpoints and torch imports are
    unaffected.
    """

    features: int
    kernel_size: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    dilation: Tuple[int, int]
    use_bias: bool = False
    dtype: Any = None
    kernel_init: Callable = kaiming_normal_fan_in
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, 1, self.features), jnp.float32)
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        k = kernel.astype(dt)[:, :, 0]
        y = depthwise_stencil(x, k, tuple(map(tuple, self.padding)),
                              tuple(self.dilation))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,),
                              jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class ConvBNReLU(nn.Module):
    """Conv → norm → ReLU with torch-style explicit padding."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    freeze_bn: bool = False
    train: bool = True
    relu: bool = True
    dtype: Any = None
    kernel_init: Callable = kaiming_normal_fan_in

    @nn.compact
    def __call__(self, x):
        # Eval mode always takes the stencil (no residuals to blow up);
        # train mode takes it behind STENCIL_TRAIN via the custom VJP
        # (depthwise_stencil), which saves only (x, k) — plain autodiff
        # of the tap loop kept a padded map copy PER TAP and OOM'd the
        # v5e train step at the production 720x1280 shapes (the round-2
        # eval-only restriction this VJP lifts). The transposed-stencil
        # dx needs pad <= dilation*(k-1), true for every head conv here.
        depthwise = ((not self.train or STENCIL_TRAIN)
                     and self.groups > 1 and self.groups == self.features
                     and x.shape[-1] == self.features
                     and self.strides == (1, 1) and not self.use_bias
                     and pad_within_margin(self.kernel_size, self.padding,
                                           self.dilation))
        if depthwise:
            x = _DepthwiseStencil(
                self.features, self.kernel_size,
                tuple(map(tuple, self.padding)), self.dilation,
                dtype=self.dtype, kernel_init=self.kernel_init,
                name="conv")(x)
        elif quant_eligible(self.strides, self.groups):
            # int8 W8A8 eval path (TPU.QUANT_EVAL): takes precedence over
            # the float lowering variants — all decoder dense convs here
            # are stride-1/ungrouped, the shapes bench_int8.py measured
            # at the MXU's double s8 rate.
            x = QuantConv(
                self.features, self.kernel_size, strides=self.strides,
                padding=self.padding, kernel_dilation=self.dilation,
                use_bias=self.use_bias, train=self.train, dtype=self.dtype,
                kernel_init=self.kernel_init, name="conv")(x)
        elif (self.groups == 1 and not self.use_bias
              and max(self.kernel_size) > 1
              and dense_stencil_eligible(self.kernel_size, self.strides,
                                         self.padding, self.dilation, 1)):
            x = DenseStencilConv(
                self.features, self.kernel_size,
                tuple(map(tuple, self.padding)), self.dilation,
                dtype=self.dtype, kernel_init=self.kernel_init,
                name="conv")(x)
        else:
            x = nn.Conv(
                self.features, self.kernel_size, strides=self.strides,
                padding=self.padding, kernel_dilation=self.dilation,
                feature_group_count=self.groups, use_bias=self.use_bias,
                dtype=self.dtype, kernel_init=self.kernel_init,
                name="conv")(x)
        x = make_norm(self.freeze_bn, self.features, dtype=self.dtype,
                      train=self.train, name="norm")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise 3x3 (+BN+ReLU) then pointwise 1x1 (+BN+ReLU).

    Mirrors DepthwiseSeparableConv2d (reference:
    core/models/classifier.py:40-85) with NHWC layout; the depthwise conv
    maps to the VPU, the pointwise 1x1 is a channel GEMM on the MXU.
    """

    in_features: int
    out_features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((1, 1), (1, 1))
    dilation: Tuple[int, int] = (1, 1)
    freeze_bn: bool = False
    train: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = ConvBNReLU(
            self.in_features, self.kernel_size, self.strides, self.padding,
            self.dilation, groups=self.in_features, freeze_bn=self.freeze_bn,
            train=self.train, dtype=self.dtype, name="depthwise")(x)
        x = ConvBNReLU(
            self.out_features, (1, 1), (1, 1), "VALID",
            freeze_bn=self.freeze_bn, train=self.train, dtype=self.dtype,
            name="pointwise")(x)
        return x
