"""Model registry / factory.

Mirrors the reference dispatch (core/models/build.py:12-75): ``MODEL.NAME``
is ``"<head>_<backbone>"`` with head in {deeplabv2, deeplabv3plus} and
backbone in the ResNet family, crossed with ``MODEL.HYPER``. The registry is
open so new backbones (e.g. a ViT/SegFormer) or heads register with a
decorator instead of an if-chain.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .classifier import (ASPPv2Head, ASPPv2HyperHead, SeparableASPPHead,
                         SeparableASPPHyperHead)
from .resnet import resnet_feature_extractor

BACKBONES: Dict[str, Callable[..., nn.Module]] = {}
HEADS: Dict[Tuple[str, bool], Callable[..., nn.Module]] = {}


def register_backbone(name):
    def deco(fn):
        BACKBONES[name] = fn
        return fn
    return deco


def register_head(name, hyper):
    def deco(fn):
        HEADS[(name, hyper)] = fn
        return fn
    return deco


for _rn in ("resnettiny", "resnet50", "resnet101", "resnet152",
            "resnext50_32x4d", "resnext101_32x8d"):
    BACKBONES[_rn] = (
        lambda cfg, dtype, _n=_rn: resnet_feature_extractor(
            _n, freeze_bn=cfg.MODEL.FREEZE_BN, dtype=dtype,
            remat=bool(getattr(cfg.TPU, "REMAT", False))))


def _make_mit(name):
    def build(cfg, dtype):
        from .segformer import MIT_ARCHS, MixVisionTransformer
        return MixVisionTransformer(
            dtype=dtype, remat=bool(getattr(cfg.TPU, "REMAT", False)),
            **MIT_ARCHS[name])
    return build


from .segformer import MIT_ARCHS as _MIT_ARCHS  # noqa: E402

for _mit in _MIT_ARCHS:
    BACKBONES[_mit] = _make_mit(_mit)


@register_head("segformer", False)
def _sf(cfg, dtype):
    from .segformer import SegFormerHead
    return SegFormerHead(num_classes=cfg.MODEL.NUM_CLASSES, dtype=dtype)


@register_head("segformer", True)
def _sfh(cfg, dtype):
    from .segformer import SegFormerHyperHead
    return SegFormerHyperHead(
        num_classes=cfg.MODEL.NUM_CLASSES,
        reduced_channels=cfg.MODEL.REDUCED_CHANNELS,
        curvature=cfg.MODEL.CURVATURE, dtype=dtype)


@register_head("deeplabv2", False)
def _v2(cfg, dtype):
    return ASPPv2Head(num_classes=cfg.MODEL.NUM_CLASSES, dtype=dtype)


@register_head("deeplabv2", True)
def _v2h(cfg, dtype):
    return ASPPv2HyperHead(
        num_classes=cfg.MODEL.NUM_CLASSES,
        reduced_channels=cfg.MODEL.REDUCED_CHANNELS,
        curvature=cfg.MODEL.CURVATURE, dtype=dtype)


@register_head("deeplabv3plus", False)
def _v3(cfg, dtype):
    return SeparableASPPHead(
        num_classes=cfg.MODEL.NUM_CLASSES,
        reduced_channels=cfg.MODEL.REDUCED_CHANNELS,
        hfr=cfg.MODEL.HFR, freeze_bn=cfg.MODEL.FREEZE_BN, dtype=dtype)


@register_head("deeplabv3plus", True)
def _v3h(cfg, dtype):
    return SeparableASPPHyperHead(
        num_classes=cfg.MODEL.NUM_CLASSES,
        reduced_channels=cfg.MODEL.REDUCED_CHANNELS,
        curvature=cfg.MODEL.CURVATURE, hfr=cfg.MODEL.HFR,
        freeze_bn=cfg.MODEL.FREEZE_BN, dtype=dtype)


def _compute_dtype(cfg):
    name = getattr(getattr(cfg, "TPU", None), "COMPUTE_DTYPE", "float32")
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(name)]


def build_feature_extractor(cfg) -> nn.Module:
    """reference: core/models/build.py:12-31."""
    _, backbone_name = cfg.MODEL.NAME.split("_", 1)
    if backbone_name not in BACKBONES:
        raise NotImplementedError(f"Unsupported backbone: {backbone_name}.")
    return BACKBONES[backbone_name](cfg, _compute_dtype(cfg))


def build_classifier(cfg) -> nn.Module:
    """reference: core/models/build.py:34-75."""
    head_name, _ = cfg.MODEL.NAME.split("_", 1)
    key = (head_name, bool(cfg.MODEL.HYPER))
    if key not in HEADS:
        raise NotImplementedError(f"Unsupported classifier: {head_name}.")
    return HEADS[key](cfg, _compute_dtype(cfg))


class Segmentor(nn.Module):
    """feature_extractor + classifier under one param tree.

    Submodule names match the reference's checkpoint prefixes
    (``feature_extractor.``/``classifier.``, core/utils/misc.py:165-178) so
    per-module loading/filtering round-trips. The forward contract is the
    learner's ``forward`` (core/train_learners.py:52-55): upsampled logits
    plus the head's auxiliary output (decoder features or ball embedding).
    """

    feature_extractor: nn.Module
    classifier: nn.Module

    @nn.compact
    def __call__(self, x, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        features = self.feature_extractor(x, train=train)
        return self.classifier(features, size=size, train=train)


def build_segmentor(cfg) -> Segmentor:
    # The TPU.* conv-lowering knobs are PROCESS-WIDE module globals read
    # at trace time (layers.py:STENCIL_TRAIN/DENSE_CONV_MODE/CONV_WGRAD):
    # the last build_segmentor call wins for every model in the process,
    # including earlier ones on any later retrace (new input shape). All
    # lowerings are value-identical (same params, reassociated sums), so
    # interleaving models built with different knobs changes performance
    # and float rounding only — never semantics — but benchmarks that A/B
    # the knobs must build and run each variant to completion separately
    # (as benchmarks/bench_* do).
    from . import layers
    layers.STENCIL_TRAIN = bool(getattr(cfg.TPU, "STENCIL_TRAIN", True))
    layers.DENSE_CONV_MODE = str(getattr(cfg.TPU, "DENSE_CONV_MODE", "conv"))
    layers.CONV_WGRAD = str(getattr(cfg.TPU, "CONV_WGRAD", "gemm"))
    # QUANT_EVAL additionally changes the VARIABLE STRUCTURE (a `quant`
    # collection per eligible conv), so a quantized build's variables are
    # not interchangeable with a float build's — init and calibrate
    # (ops/quant.calibrate) the quantized model explicitly.
    layers.QUANT_EVAL = bool(getattr(cfg.TPU, "QUANT_EVAL", False))
    return Segmentor(feature_extractor=build_feature_extractor(cfg),
                     classifier=build_classifier(cfg))
