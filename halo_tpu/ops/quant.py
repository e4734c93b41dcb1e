"""Post-training int8 quantization for the eval/serving path.

The v5e MXU rates int8 at double the bf16 throughput (394 vs 197 TOPS),
and XLA lowers ``s8 x s8 -> s32`` contractions onto it AT RATE through
both ``dot_general`` and the dilated-conv emitter (measured 1.7-2.0x at
the flagship trunk/head shapes — benchmarks/bench_int8.py). This module
is the machinery that turns that into an opt-in W8A8 inference path
(``cfg.TPU.QUANT_EVAL``; the reference has no quantized path — its eval
runs the fp32/fp16 model, core/train_learners.py:57-92 — so this is a
TPU-native extension, not a parity item):

  * weights: symmetric per-output-channel int8, quantized ONCE at
    calibration time into the ``quant`` variable collection (``w_int8``,
    ``w_scale``) so inference never re-reads the f32 kernels;
  * activations: symmetric per-tensor int8 against a calibrated running
    absmax (``amax`` in the same collection), quantize fused into the
    producer's epilogue (one VPU pass, no extra HBM traffic);
  * accumulation: int32 on the MXU, dequantized by ``sx * w_scale[c]``
    in f32, then cast to the compute dtype so BN/ReLU fuse as usual.

Which convs quantize is decided statically at model build
(models/layers.py:quant_eligible — ungrouped convs that are stride-1,
OR strided with Cin>=128 and a large output grid, the round-4
extension measured in benchmarks/bench_int8_strided.py: the whole
dilated trunk minus the stem, the ResNet downsample transitions, the
decoder's dense convs, and the wide MiT patch embeds; the
logits/embedding producers and the hyperbolic head stay float, the
standard first/last-layer PTQ exclusions).

Calibration must run before quantized inference: ``calibrate`` feeds
representative eval batches through the model with the ``quant``
collection mutable (each QuantConv records ``max |x|`` and freezes its
weights), and ``assert_calibrated`` is the host-side guard. An
uncalibrated model (amax == 0) produces all-zero quantized activations
rather than NaNs.
"""

from __future__ import annotations

from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
from jax import lax

_CONV_DN = ("NHWC", "HWIO", "NHWC")
# Smallest scale guard: keeps 1/scale finite for all-zero calibration or
# all-zero weight channels (their quantized values are then 0 anyway).
_EPS = 1e-12


def quantize_weight(kernel: jax.Array):
    """Symmetric per-output-channel int8 quantization of a channels-last
    kernel (HWIO conv or (Cin, Cout) dense — the output channel is the
    LAST axis in both layouts).

    Returns ``(w_int8, w_scale)`` with ``w_scale`` shaped ``(Cout,)`` and
    ``kernel ~= w_int8 * w_scale``.
    """
    kernel = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(
        jnp.max(jnp.abs(kernel), axis=tuple(range(kernel.ndim - 1))),
        _EPS) / 127.0
    w_int8 = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    return w_int8, w_scale


def quantize_act(x: jax.Array, amax: jax.Array):
    """Symmetric per-tensor int8 quantization against a calibrated absmax.

    The divide/round runs in f32 regardless of ``x``'s dtype (bf16's
    8-bit mantissa would double-quantize the grid); XLA fuses the whole
    thing into the producing op's epilogue.
    """
    sx = jnp.maximum(amax.astype(jnp.float32), _EPS) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def int8_conv(x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
              amax: jax.Array, strides, padding, dilation) -> jax.Array:
    """W8A8 conv: int8 x int8 -> int32 on the MXU, f32 dequant output.

    Symmetric quantization keeps the zero-point at 0, so XLA's implicit
    zero padding is exact. ``padding`` may be numeric pairs or
    'SAME'/'VALID', matching ``flax.linen.Conv``.
    """
    xq, sx = quantize_act(x, amax)
    y = lax.conv_general_dilated(
        xq, w_int8, tuple(strides), padding, rhs_dilation=tuple(dilation),
        dimension_numbers=_CONV_DN, preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * w_scale)


def int8_dense(x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
               amax: jax.Array) -> jax.Array:
    """W8A8 dense: ``x @ w`` with int8 x int8 -> int32 on the MXU's
    double-rate path, f32 dequant output.

    ``x`` is (..., Cin), ``w_int8`` (Cin, Cout). Same symmetric scheme as
    int8_conv; measured 1.4-2.0x vs bf16 across the MiT per-block GEMM
    shapes (benchmarks/bench_int8_mit.py).
    """
    xq, sx = quantize_act(x, amax)
    y = lax.dot_general(xq, w_int8, (((xq.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (sx * w_scale)


def calibrate(model, variables: Dict, batches: Iterable[Any],
              reset: bool = True, **apply_kwargs) -> Dict:
    """PTQ calibration pass: returns ``variables`` with the ``quant``
    collection populated (running activation absmax per quantized conv,
    plus the frozen int8 weights).

    ``batches`` are model inputs (images, NHWC); extra ``apply_kwargs``
    (e.g. ``size=``) pass through to ``model.apply``. Re-run after any
    weight load — the frozen int8 weights snapshot ``params`` as of the
    last calibration. By default (``reset=True``) the running activation
    absmax restarts from zero so a re-calibration fully replaces the
    scales — an amax inherited from previous weights/data would only ever
    inflate (it is a running max) and silently coarsen the activation
    grid. Pass ``reset=False`` to accumulate across calls (streaming
    calibration over batches already works within one call either way).
    """
    if "quant" not in variables:
        raise ValueError(
            "variables carry no 'quant' collection — build the model with "
            "cfg.TPU.QUANT_EVAL=True before calibrating")
    if reset:
        variables = dict(variables)
        variables["quant"] = jax.tree_util.tree_map_with_path(
            lambda p, leaf: (jnp.zeros_like(leaf)
                             if "amax" in jax.tree_util.keystr(p) else leaf),
            variables["quant"])

    @jax.jit
    def step(v, x):
        _, mutated = model.apply(v, x, train=False, mutable=["quant"],
                                 **apply_kwargs)
        return mutated["quant"]

    out = dict(variables)
    ran = False
    for x in batches:
        out["quant"] = step(out, x)
        ran = True
    if not ran:
        raise ValueError("calibrate() needs at least one batch")
    return out


def assert_calibrated(variables: Dict) -> None:
    """Host-side guard: every quantized conv has seen calibration data
    (amax > 0). Cheap (scalars only); call before a quantized eval."""
    q = variables.get("quant")
    if not q:
        raise ValueError(
            "variables carry no 'quant' collection — build with "
            "cfg.TPU.QUANT_EVAL=True and run ops.quant.calibrate")
    for path, leaf in jax.tree_util.tree_leaves_with_path(q):
        name = jax.tree_util.keystr(path)
        if "amax" in name and float(leaf) <= 0.0:
            raise ValueError(
                f"uncalibrated quantized conv at {name}: run "
                "ops.quant.calibrate on representative batches first")
