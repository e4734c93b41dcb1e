from .build import (build_classifier, build_feature_extractor,
                    build_segmentor, Segmentor, BACKBONES, HEADS)
from .resnet import ResNetFeatures, resnet_feature_extractor
from .classifier import (ASPPv2Head, ASPPv2HyperHead, SeparableASPPHead,
                         SeparableASPPHyperHead, HyperMLRHead, HFRNorm)
from .layers import FrozenBatchNorm, DepthwiseSeparableConv, ConvBNReLU
