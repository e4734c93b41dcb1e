"""HALO-TPU: a TPU-native JAX framework for hyperbolic active learning in
semantic segmentation under domain shift.

Re-designed from scratch for TPU (JAX/Flax/Pallas/GSPMD) with the feature set
of the reference PyTorch implementation of HALO (ICML 2024): DeepLab-v2/v3+
(ResNet-101) and SegFormer segmentation backbones, a Poincare-ball hyperbolic
classification head, and region-based active learning driven by hyperbolic
radius x region entropy acquisition for GTAV/SYNTHIA -> Cityscapes (+ ACDC)
active domain adaptation.
"""

__version__ = "0.1.0"
