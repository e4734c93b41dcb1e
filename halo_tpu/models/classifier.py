"""Segmentation heads: DeepLab-v2 / v3+ ASPP, Euclidean and hyperbolic.

TPU-native re-implementation of the reference's four classifier variants
(reference: core/models/classifier.py:10-569):

  * ``ASPPv2Head``            — DeepLab-v2 ASPP, Euclidean logits.
  * ``ASPPv2HyperHead``       — v2 ASPP → embedding → Poincare MLR.
  * ``SeparableASPPHead``     — DeepLab-v3+ (ASPP + decoder), Euclidean.
  * ``SeparableASPPHyperHead``— v3+ decoder → reduce → (HFR) → expmap →
                                Poincare MLR.

Everything is NHWC; the hyperbolic head is the f32 fused formulation in
``halo_tpu.ops.hyperbolic`` (the reference computes it in float64 —
core/models/classifier.py:553-554 — which TPUs only emulate; tests pin the
f32/f64 error envelope instead).

Heads return ``(logits, embedding)`` uniformly; the v2 Euclidean head
returns ``(logits, None)`` (the reference returns a bare tensor there, which
its own trainer then mis-indexes — SURVEY.md §7 bug list — so the uniform
tuple is the deliberate fix).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import hyperbolic as hyp
from ..ops.resize import resize_bilinear
from .layers import (ConvBNReLU, DenseStencilConv, DepthwiseSeparableConv,
                     dense_stencil_eligible, kaiming_normal_fan_in,
                     normal_init, torch_conv_bias_init,
                     torch_linear_bias_init, torch_linear_kernel_init)


def _aspp_conv(features, d, x, dtype, name):
    """One dilated 3x3 ASPP conv with bias and N(0, 0.01) kernel init
    (reference: core/models/classifier.py:13-24, 318-327); lowered as
    shifted channel GEMMs when eligible (layers.dense_stencil)."""
    kwargs = dict(use_bias=True, dtype=dtype, kernel_init=normal_init(0.01),
                  bias_init=torch_conv_bias_init((3, 3), x.shape[-1]),
                  name=name)
    if dense_stencil_eligible((3, 3), (1, 1), ((d, d), (d, d)), (d, d), 1):
        return DenseStencilConv(features, (3, 3), ((d, d), (d, d)),
                                (d, d), **kwargs)(x)
    return nn.Conv(features, (3, 3), padding=((d, d), (d, d)),
                   kernel_dilation=(d, d), **kwargs)(x)


class HyperMLRHead(nn.Module):
    """Poincare-ball multinomial logistic regression over dense maps.

    Parameters match the reference HyperMLR: ``P_MLR``/``A_MLR`` are plain
    (num_classes, C) tensors with kaiming-uniform init
    (core/utils/hyperbolic.py:115-118). The logits chain is two channel
    GEMMs (MXU) plus an elementwise tail (ops/hyperbolic.py).
    """

    num_classes: int
    channels: int
    c: float = 1.0

    @nn.compact
    def __call__(self, x_ball):
        def init_one(key, shape, dtype=jnp.float32):
            bound = 1.0 / jnp.sqrt(shape[1])
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        p = self.param("p_mlr", init_one, (self.num_classes, self.channels))
        a = self.param("a_mlr", init_one, (self.num_classes, self.channels))
        x32 = x_ball.astype(jnp.float32)
        return hyp.hyper_mlr_logits(
            x32, p, a, c=self.c, precision=jax.lax.Precision.HIGHEST)


class ASPPv2Head(nn.Module):
    """DeepLab-v2 ASPP: sum of four dilated 3x3 convs → class logits
    (reference: ASPP_Classifier_V2, core/models/classifier.py:10-37)."""

    num_classes: int
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        x = feats["out"]
        out = None
        for i, d in enumerate(self.dilations):
            y = _aspp_conv(self.num_classes, d, x, self.dtype,
                           name=f"aspp_{i}")
            out = y if out is None else out + y
        if size is not None:
            out = resize_bilinear(out, size)
        return out, None


class ASPPv2HyperHead(nn.Module):
    """DeepLab-v2 ASPP → reduced embedding → expmap → Poincare MLR
    (reference: ASPP_Classifier_V2_Hyper, core/models/classifier.py:333-379)."""

    num_classes: int
    reduced_channels: int = 64
    curvature: float = 1.0
    dilations: Sequence[int] = (6, 12, 18, 24)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        x = feats["out"]
        embed = None
        for i, d in enumerate(self.dilations):
            y = _aspp_conv(self.reduced_channels, d, x, self.dtype,
                           name=f"aspp_{i}")
            embed = y if embed is None else embed + y
        embed = hyp.expmap(embed.astype(jnp.float32), c=self.curvature,
                           axis=-1)
        out = HyperMLRHead(self.num_classes, self.reduced_channels,
                           c=self.curvature, name="mlr")(embed)
        if size is not None:
            out = resize_bilinear(out, size)
            embed = resize_bilinear(embed, size)
        return out, embed


class _ASPPDecoder(nn.Module):
    """Shared v3+ trunk: ASPP branches + global branch + bottleneck +
    low-level shortcut + two separable decoder convs → 512-ch feature map at
    the low-level (stride 4) resolution (reference:
    core/models/classifier.py:88-163 / 382-475)."""

    dilations: Sequence[int] = (1, 6, 12, 18)
    out_channels: int = 512
    shortcut_channels: int = 48
    freeze_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = True):
        low = feats["low"]
        x = feats["out"]

        branches = []
        for i, d in enumerate(self.dilations):
            if d == 1:
                y = ConvBNReLU(self.out_channels, (1, 1), padding="VALID",
                               freeze_bn=self.freeze_bn, train=train,
                               dtype=self.dtype, name=f"branch_{i}")(x)
            else:
                y = DepthwiseSeparableConv(
                    x.shape[-1], self.out_channels, padding=((d, d), (d, d)),
                    dilation=(d, d), freeze_bn=self.freeze_bn, train=train,
                    dtype=self.dtype, name=f"branch_{i}")(x)
            branches.append(y)

        g = jnp.mean(x, axis=(-3, -2), keepdims=True)
        g = ConvBNReLU(self.out_channels, (1, 1), padding="VALID",
                       freeze_bn=self.freeze_bn, train=train,
                       dtype=self.dtype, name="global_branch")(g)
        g = jnp.broadcast_to(
            g, x.shape[:-1] + (self.out_channels,))  # align-corners 1x1 upsample
        branches.append(g)

        y = jnp.concatenate(branches, axis=-1)
        y = ConvBNReLU(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       freeze_bn=self.freeze_bn, train=train,
                       dtype=self.dtype, name="bottleneck")(y)
        y = resize_bilinear(y, low.shape[-3:-1])

        sc = ConvBNReLU(self.shortcut_channels, (1, 1), padding="VALID",
                        freeze_bn=self.freeze_bn, train=train,
                        dtype=self.dtype, name="shortcut")(low)
        y = jnp.concatenate([y, sc], axis=-1)

        y = DepthwiseSeparableConv(
            y.shape[-1], self.out_channels, freeze_bn=self.freeze_bn,
            train=train, dtype=self.dtype, name="decoder_0")(y)
        y = DepthwiseSeparableConv(
            self.out_channels, self.out_channels, freeze_bn=self.freeze_bn,
            train=train, dtype=self.dtype, name="decoder_1")(y)
        return y


class HFRNorm(nn.Module):
    """Hyperbolic Feature Reweighting: per-pixel MLP → per-channel mean
    weights (clamped ≥1e-5) × per-channel spatially-L2-normalized features
    (reference: core/models/classifier.py:284-304, 530-550)."""

    channels: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        y = nn.Dense(self.channels, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(self.channels),
                     name="fc1")(x)
        # BatchNorm1d over all pixels == BatchNorm reducing (B, H, W).
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(y)
        y = nn.relu(y)
        y = nn.Dense(self.channels, kernel_init=torch_linear_kernel_init,
                     bias_init=torch_linear_bias_init(self.channels),
                     name="fc2")(y)
        weights = jnp.mean(y, axis=(1, 2), keepdims=True)       # (B,1,1,C)
        weights = jnp.maximum(weights, 1e-5)
        # F.normalize over the flattened spatial dim, per channel.
        # (max inside the sqrt: sqrt'(0)=inf would poison gradients)
        sq = jnp.sum(x * x, axis=(1, 2), keepdims=True)
        xn = x / jnp.sqrt(jnp.maximum(sq, 1e-24))
        return xn * weights


class SeparableASPPHead(nn.Module):
    """DeepLab-v3+ Euclidean head (reference: DepthwiseSeparableASPP,
    core/models/classifier.py:88-328). ``old_decoder`` layout (Dropout2d +
    1x1 cls conv fused at the end) is used when reduced_channels==512 and
    hfr is off, exactly like the reference's constructor switch (:162-164)."""

    num_classes: int
    reduced_channels: int = 512
    hfr: bool = False
    freeze_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        y = _ASPPDecoder(freeze_bn=self.freeze_bn, dtype=self.dtype,
                         name="aspp")(feats, train=train)
        old_decoder = self.reduced_channels == 512 and not self.hfr
        if old_decoder:
            decoder_out = y
            # Dropout2d: zero whole channels.
            y = nn.Dropout(0.1, broadcast_dims=(1, 2),
                           deterministic=not train)(y)
            out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                          dtype=self.dtype,
                          kernel_init=kaiming_normal_fan_in,
                          bias_init=torch_conv_bias_init((1, 1), 512),
                          name="cls_conv")(y)
        else:
            if self.reduced_channels != 512:
                y = nn.Conv(self.reduced_channels, (1, 1), use_bias=True,
                            dtype=self.dtype,
                            kernel_init=kaiming_normal_fan_in,
                            bias_init=torch_conv_bias_init((1, 1), 512),
                            name="conv_reduce")(y)
            if self.hfr:
                y = HFRNorm(self.reduced_channels, name="hfr")(y, train=train)
            decoder_out = y
            y = nn.Dropout(0.1, deterministic=not train)(y)
            out = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                          dtype=self.dtype,
                          kernel_init=kaiming_normal_fan_in,
                          bias_init=torch_conv_bias_init(
                              (1, 1), self.reduced_channels),
                          name="cls_conv")(y)
        if size is not None:
            out = resize_bilinear(out, size)
        return out, decoder_out


class SeparableASPPHyperHead(nn.Module):
    """DeepLab-v3+ hyperbolic head (reference: DepthwiseSeparableASPP_Hyper,
    core/models/classifier.py:382-558): decoder → Dropout2d → 1x1 reduce →
    optional HFR → expmap → Poincare MLR. Returns (logits, ball embedding at
    feature resolution)."""

    num_classes: int
    reduced_channels: int = 64
    curvature: float = 1.0
    hfr: bool = True
    freeze_bn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        y = _ASPPDecoder(freeze_bn=self.freeze_bn, dtype=self.dtype,
                         name="aspp")(feats, train=train)
        y = nn.Dropout(0.1, broadcast_dims=(1, 2),
                       deterministic=not train)(y)
        y = nn.Conv(self.reduced_channels, (1, 1), use_bias=True,
                    dtype=self.dtype, kernel_init=kaiming_normal_fan_in,
                    bias_init=torch_conv_bias_init((1, 1), 512),
                    name="conv_reduce")(y)
        if self.hfr:
            y = HFRNorm(self.reduced_channels, name="hfr")(y, train=train)
        embed = hyp.expmap(y.astype(jnp.float32), c=self.curvature, axis=-1)
        out = HyperMLRHead(self.num_classes, self.reduced_channels,
                           c=self.curvature, name="mlr")(embed)
        if size is not None:
            out = resize_bilinear(out, size)
        return out, embed
