"""Dilated ResNet backbones in Flax (NHWC, TPU-first).

Functional re-implementation of the torchvision-style backbone the reference
uses (reference: core/models/resnet.py:72-294, core/models/feature_extractor.py:7-24):
Bottleneck ResNet with ``replace_stride_with_dilation=[False, True, True]``
(output stride 8) returning a feature pyramid dict
``{'low': layer1 (256ch, stride 4), 'out': layer4 (2048ch, stride 8)}``.

TPU notes:
  * NHWC layout end-to-end; XLA maps the convs onto the MXU directly.
  * FrozenBatchNorm folds into per-channel scale+bias fused with the convs.
  * All shapes are static; the module is pure and jit/pjit-friendly.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from . import layers as layers_mod
from .layers import (DenseStencilConv, FrozenBatchNorm, GemmWgradConv,
                     PallasDilatedConv, QuantConv, dense_stencil_eligible,
                     gemm_wgrad_eligible, kaiming_normal_fan_out, make_conv,
                     make_norm, pallas_conv_eligible, quant_eligible,
                     space_to_batch_conv)


class Bottleneck(nn.Module):
    """1x1 reduce → 3x3 (stride/dilation) → 1x1 expand, residual add.

    Matches torchvision Bottleneck (reference: core/models/resnet.py:72-112);
    expansion 4, stride on the 3x3 conv.
    """

    planes: int
    strides: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    has_downsample: bool = False
    freeze_bn: bool = False
    train: bool = True
    dtype: Any = None

    expansion = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x

        # The 1x1 reduce/expand convs are always stride 1 here (torch
        # puts the stride on the 3x3), so make_conv routes them through
        # the int8 eval path under TPU.QUANT_EVAL.
        y = make_conv(width, (1, 1), use_bias=False, train=self.train,
                      dtype=self.dtype, kernel_init=kaiming_normal_fan_out,
                      name="conv1")(x)
        y = make_norm(self.freeze_bn, width, dtype=self.dtype,
                      train=self.train, name="bn1")(y)
        y = nn.relu(y)

        d = self.dilation
        if quant_eligible((self.strides, self.strides), self.groups,
                          in_features=width):
            # int8 W8A8 eval path (TPU.QUANT_EVAL) — the whole trunk
            # 3x3 family: stride-1 dilated convs run s8 at the MXU
            # double rate (bench_int8.py) and layer2's stride-2 first
            # block measured 1.46x (bench_int8_strided.py; the small-
            # grid fallback inside QuantConv keeps tiny inputs float).
            y = QuantConv(width, (3, 3),
                          strides=(self.strides, self.strides),
                          padding=((d, d), (d, d)),
                          kernel_dilation=(d, d), train=self.train,
                          dtype=self.dtype,
                          kernel_init=kaiming_normal_fan_out,
                          name="conv2")(y)
        elif pallas_conv_eligible(y.shape, width, (self.strides, self.strides),
                                (d, d), self.groups,
                                itemsize=jnp.dtype(y.dtype).itemsize):
            # VMEM-resident Pallas tap GEMMs (layers.DENSE_CONV_MODE
            # "pallas"): the padded input block is DMA'd once and all 9
            # shifted dots read it from VMEM (ops/pallas_conv.py)
            y = PallasDilatedConv(width, d, dtype=self.dtype,
                                  kernel_init=kaiming_normal_fan_out,
                                  name="conv2")(y)
        elif dense_stencil_eligible((3, 3), (self.strides, self.strides),
                                    ((d, d), (d, d)), (d, d), self.groups):
            # 9 shifted channel GEMMs (layers.DENSE_CONV_MODE "shift9")
            y = DenseStencilConv(width, (3, 3), ((d, d), (d, d)), (d, d),
                                 dtype=self.dtype,
                                 kernel_init=kaiming_normal_fan_out,
                                 name="conv2")(y)
        elif (layers_mod.DENSE_CONV_MODE == "s2b" and d > 1
              and self.strides == 1 and self.groups == 1
              and y.shape[1] % d == 0 and y.shape[2] % d == 0):
            # space-to-batch around an UNdilated conv: same params
            conv = nn.Conv(width, (3, 3), padding=((1, 1), (1, 1)),
                           use_bias=False, dtype=self.dtype,
                           kernel_init=kaiming_normal_fan_out,
                           name="conv2")
            y = space_to_batch_conv(y, conv, d)
        elif gemm_wgrad_eligible((3, 3), (self.strides, self.strides),
                                 ((d, d), (d, d)), (d, d), self.groups):
            # XLA emitter fwd/dgrad + GEMM wgrad (layers.CONV_WGRAD
            # "gemm", the default): identical forward HLO, ~1.6x -> ~1x
            # weight-grad on the dilated convs (bench_bwd_parts.py)
            y = GemmWgradConv(width, (3, 3), ((d, d), (d, d)), (d, d),
                              dtype=self.dtype,
                              kernel_init=kaiming_normal_fan_out,
                              name="conv2")(y)
        else:
            y = nn.Conv(width, (3, 3), strides=(self.strides, self.strides),
                        padding=((d, d), (d, d)), kernel_dilation=(d, d),
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, kernel_init=kaiming_normal_fan_out,
                        name="conv2")(y)
        y = make_norm(self.freeze_bn, width, dtype=self.dtype,
                      train=self.train, name="bn2")(y)
        y = nn.relu(y)

        y = make_conv(out_ch, (1, 1), use_bias=False, train=self.train,
                      dtype=self.dtype, kernel_init=kaiming_normal_fan_out,
                      name="conv3")(y)
        y = make_norm(self.freeze_bn, out_ch, dtype=self.dtype,
                      train=self.train, name="bn3")(y)

        if self.has_downsample:
            # All downsample projections quantize: stride-1 ones (layer1
            # and the dilated stages' first blocks) per bench_int8.py,
            # layer2's stride-2 256->512 at 1.47x per
            # bench_int8_strided.py (Cin >= 128 static gate).
            identity = make_conv(
                out_ch, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, train=self.train, dtype=self.dtype,
                kernel_init=kaiming_normal_fan_out, name="downsample_conv",
                in_features=x.shape[-1])(x)
            identity = make_norm(
                self.freeze_bn, out_ch, dtype=self.dtype, train=self.train,
                name="downsample_bn")(identity)

        return nn.relu(y + identity)


class ResNetFeatures(nn.Module):
    """ResNet trunk returning the {'low', 'out'} pyramid.

    ``replace_stride_with_dilation`` follows torchvision `_make_layer`
    bookkeeping exactly (reference: core/models/resnet.py:168-191): when a
    stage dilates, its first block keeps the *previous* dilation with stride
    1, and subsequent blocks use the multiplied dilation.
    """

    stage_sizes: Sequence[int] = (3, 4, 23, 3)  # resnet101
    replace_stride_with_dilation: Sequence[bool] = (False, True, True)
    groups: int = 1
    base_width: int = 64
    freeze_bn: bool = False
    dtype: Any = None
    return_aux: bool = False  # also tap layer3 (reference feature_extractor.py:18-19)
    # Rematerialize each residual block in backward (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(depth) less activation memory, buying
    # larger per-chip batches at 720x1280 (HBM is 16 GB on v5e).
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming_normal_fan_out, name="conv1")(x)
        x = make_norm(self.freeze_bn, 64, dtype=self.dtype, train=train,
                      name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        inplanes = 64
        dilation = 1
        block_cls = nn.remat(Bottleneck) if self.remat else Bottleneck
        planes_per_stage = (64, 128, 256, 512)
        for stage, (planes, blocks) in enumerate(
                zip(planes_per_stage, self.stage_sizes)):
            stride = 1 if stage == 0 else 2
            dilate = (stage > 0 and
                      self.replace_stride_with_dilation[stage - 1])
            previous_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for b in range(blocks):
                first = b == 0
                x = block_cls(
                    planes=planes,
                    strides=stride if first else 1,
                    dilation=previous_dilation if first else dilation,
                    groups=self.groups,
                    base_width=self.base_width,
                    has_downsample=first and (
                        stride != 1 or
                        inplanes != planes * Bottleneck.expansion),
                    freeze_bn=self.freeze_bn,
                    train=train,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(x)
                if first:
                    inplanes = planes * Bottleneck.expansion
            if stage == 0:
                feats["low"] = x
            if stage == 2 and self.return_aux:
                feats["aux"] = x
        feats["out"] = x
        return feats


_ARCHS = {
    # name: (stage_sizes, groups, width_per_group)
    "resnettiny": ((1, 1, 1, 1), 1, 64),  # test/debug-scale arch
    "resnet50": ((3, 4, 6, 3), 1, 64),
    "resnet101": ((3, 4, 23, 3), 1, 64),
    "resnet152": ((3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": ((3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": ((3, 4, 23, 3), 32, 8),
}


def resnet_feature_extractor(backbone_name: str,
                             freeze_bn: bool = False,
                             dtype: Any = None,
                             aux: bool = False,
                             remat: bool = False) -> ResNetFeatures:
    """Factory mirroring resnet_feature_extractor
    (reference: core/models/feature_extractor.py:7-24). Pretrained-weight
    loading is a separate, explicit step (models/port_torch.py) rather than
    an __init__ side effect."""
    if backbone_name not in _ARCHS:
        raise NotImplementedError(
            f"Unsupported backbone: {backbone_name}.")
    sizes, groups, width = _ARCHS[backbone_name]
    return ResNetFeatures(
        stage_sizes=sizes, groups=groups, base_width=width,
        replace_stride_with_dilation=(False, True, True),
        freeze_bn=freeze_bn, dtype=dtype, return_aux=aux, remat=remat)
