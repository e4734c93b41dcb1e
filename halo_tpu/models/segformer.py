"""SegFormer (Mix Transformer) backbone + heads, TPU-native Flax.

The reference supports a SegFormer-B4 backbone on its unmounted `segformer`
branch (reference: README.md:104-116; capability named in BASELINE.json
config #5). Rebuilt here from the published architecture (Xie et al. 2021,
"SegFormer: Simple and Efficient Design for Semantic Segmentation with
Transformers"):

  * MiT encoder: 4 stages of overlap patch embedding + efficient
    self-attention (spatial-reduction KV) + Mix-FFN (dense -> depthwise
    3x3 -> GELU -> dense), LayerNorm throughout.
  * All-MLP decoder head: per-stage linear -> bilinear upsample to 1/4 ->
    concat -> fuse -> classify; plus a hyperbolic variant that maps the
    fused features into the Poincare ball and classifies with the shared
    HyperMLR head (so HALO's radius acquisition works unchanged).

TPU notes: attention runs in (tokens, heads, dim) with sequence lengths
kept as H*W of the stage (static); KV spatial reduction keeps the score
matmuls MXU-sized. bf16-friendly; LayerNorm/softmax accumulate in f32.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import hyperbolic as hyp
from ..ops.resize import resize_bilinear
from .classifier import HyperMLRHead
from . import layers as layers_mod
from .layers import (_DepthwiseStencil, make_conv, make_dense,
                     torch_linear_kernel_init)


class OverlapPatchEmbed(nn.Module):
    features: int
    patch: int
    stride: int
    dtype: Any = None
    train: bool = True

    @nn.compact
    def __call__(self, x):
        p = self.patch // 2
        # make_conv so the int8 eval path can take the wide strided
        # embeds: pe3 (Cin=128) measured 1.52x on the s8 MXU pipeline;
        # pe1/pe2 (Cin 3/64) fail the static Cin>=128 gate and pe4's
        # small output grid falls back per trace (bench_int8_strided.py).
        x = make_conv(self.features, (self.patch, self.patch),
                      strides=(self.stride, self.stride),
                      padding=((p, p), (p, p)), use_bias=True,
                      train=self.train, dtype=self.dtype,
                      kernel_init=nn.initializers.lecun_normal(),
                      name="proj", in_features=x.shape[-1])(x)
        # official MiT: plain nn.LayerNorm here (eps 1e-5), unlike the
        # block norms which are built with eps=1e-6
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x


class EfficientAttention(nn.Module):
    """MHA with spatial-reduction KV (SegFormer eq. 2).

    The q/kv/proj projections route through make_dense, so the int8
    W8A8 eval path (TPU.QUANT_EVAL) picks them up — measured 1.4-2.0x
    per GEMM on the MXU's double-rate s8 pipeline
    (benchmarks/bench_int8_mit.py). The attention einsums themselves
    stay bf16 (their scales are per-batch dynamic, outside PTQ's
    calibrated-static scheme).
    """

    dim: int
    heads: int
    sr_ratio: int
    dtype: Any = None
    train: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        q = make_dense(self.dim, dtype=self.dtype, train=self.train,
                       name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                            strides=(self.sr_ratio, self.sr_ratio),
                            dtype=self.dtype, name="sr")(x)
            kv_in = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                 name="sr_norm")(kv_in)  # official: plain LN
        k = make_dense(self.dim, dtype=self.dtype, train=self.train,
                       name="k")(kv_in)
        v = make_dense(self.dim, dtype=self.dtype, train=self.train,
                       name="v")(kv_in)

        hd = self.dim // self.heads
        q = q.reshape(b, h * w, self.heads, hd)
        k = k.reshape(b, -1, self.heads, hd)
        v = v.reshape(b, -1, self.heads, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, jnp.float32)).astype(q.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w,
                                                             self.dim)
        return make_dense(self.dim, dtype=self.dtype, train=self.train,
                          name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    mlp_ratio: int = 4
    dtype: Any = None
    train: bool = True

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.mlp_ratio
        y = make_dense(hidden, dtype=self.dtype, train=self.train,
                       name="fc1")(x)
        # Depthwise 3x3 as the shifted-MAC stencil rather than a grouped
        # nn.Conv: XLA's grouped lowering measured ~35% slower on v5e
        # (layers.py:_DepthwiseStencil; MiT-B4 end-to-end 55->69 img/s,
        # benchmarks/bench_segformer.py); train-safe via the
        # depthwise_stencil custom VJP, gated on TPU.STENCIL_TRAIN like
        # ConvBNReLU so the documented escape hatch applies here too.
        # Param layout identical to the grouped conv ((3,3,1,C) kernel +
        # bias), so torch SegFormer imports (port_torch.py:96-97) and
        # checkpoints are unaffected by the lowering choice.
        if not self.train or layers_mod.STENCIL_TRAIN:
            y = _DepthwiseStencil(hidden, (3, 3), ((1, 1), (1, 1)), (1, 1),
                                  use_bias=True, dtype=self.dtype,
                                  kernel_init=nn.initializers.lecun_normal(),
                                  name="dwconv")(y)
        else:
            y = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                        feature_group_count=hidden, dtype=self.dtype,
                        name="dwconv")(y)
        # exact erf GELU — torch nn.GELU's default; flax's default is the
        # tanh approximation, which would break ported-checkpoint parity
        y = nn.gelu(y, approximate=False)
        y = make_dense(self.dim, dtype=self.dtype, train=self.train,
                       name="fc2")(y)
        return y


class MiTBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    dtype: Any = None
    train: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + EfficientAttention(self.dim, self.heads, self.sr_ratio,
                                   dtype=self.dtype, train=self.train,
                                   name="attn")(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x = x + MixFFN(self.dim, self.mlp_ratio, dtype=self.dtype,
                       train=self.train, name="ffn")(y)
        return x


class MixVisionTransformer(nn.Module):
    """MiT encoder returning all four stage maps plus the head contract's
    {'low' (stride 4), 'out' (stride 32)} aliases."""

    embed_dims: Sequence[int] = (64, 128, 320, 512)   # B4/B5 family
    depths: Sequence[int] = (3, 8, 27, 3)             # B4
    heads: Sequence[int] = (1, 2, 5, 8)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    mlp_ratio: int = 4
    dtype: Any = None
    # TPU.REMAT: per-block rematerialization, same trade as the ResNet
    # trunk's (resnet.py) — O(depth) less activation memory for ~1/3 more
    # backward FLOPs
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        block_cls = nn.remat(MiTBlock) if self.remat else MiTBlock
        feats = {}
        for s in range(4):
            x = OverlapPatchEmbed(
                self.embed_dims[s], patch=7 if s == 0 else 3,
                stride=4 if s == 0 else 2, dtype=self.dtype,
                train=train, name=f"patch_embed{s + 1}")(x)
            for b in range(self.depths[s]):
                x = block_cls(self.embed_dims[s], self.heads[s],
                              self.sr_ratios[s], self.mlp_ratio,
                              dtype=self.dtype, train=train,
                              name=f"block{s + 1}_{b}")(x)
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                             name=f"norm{s + 1}")(x)
            feats[f"c{s + 1}"] = x
        feats["low"] = feats["c1"]
        feats["out"] = feats["c4"]
        return feats


MIT_ARCHS = {
    "mitb0": dict(embed_dims=(32, 64, 160, 256), depths=(2, 2, 2, 2)),
    "mitb1": dict(embed_dims=(64, 128, 320, 512), depths=(2, 2, 2, 2)),
    "mitb2": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 6, 3)),
    "mitb3": dict(embed_dims=(64, 128, 320, 512), depths=(3, 4, 18, 3)),
    "mitb4": dict(embed_dims=(64, 128, 320, 512), depths=(3, 8, 27, 3)),
    "mitb5": dict(embed_dims=(64, 128, 320, 512), depths=(3, 6, 40, 3)),
    "mittiny": dict(embed_dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
                    heads=(1, 2, 4, 8)),
}


class SegFormerHead(nn.Module):
    """All-MLP decoder (SegFormer sec. 3.2): per-stage linear -> upsample
    to 1/4 -> concat -> fuse -> dropout -> 1x1 classifier."""

    num_classes: int
    embed_dim: int = 768
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, feats, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        fused = self._fuse(feats, train)
        out = nn.Dropout(self.dropout, deterministic=not train)(fused)
        out = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                      name="cls")(out)
        if size is not None:
            out = resize_bilinear(out, size)
        return out, fused

    def _fuse(self, feats, train):
        target_hw = feats["c1"].shape[1:3]
        ups = []
        for s in range(4):
            y = make_dense(self.embed_dim, dtype=self.dtype,
                           kernel_init=torch_linear_kernel_init,
                           train=train,
                           name=f"linear_c{s + 1}")(feats[f"c{s + 1}"])
            ups.append(resize_bilinear(y, target_hw))
        y = jnp.concatenate(ups[::-1], axis=-1)
        # stride-1 ungrouped 1x1 — QuantConv-eligible under the same rule
        # as the flagship decoder (the `cls`/`conv_reduce` producers
        # below stay float: standard last-layer PTQ exclusion)
        y = make_conv(self.embed_dim, (1, 1), use_bias=False,
                      train=train, dtype=self.dtype,
                      kernel_init=nn.initializers.lecun_normal(),
                      name="fuse_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="fuse_bn")(y)
        return nn.relu(y)


class SegFormerHyperHead(SegFormerHead):
    """SegFormer decoder -> channel reduce -> expmap -> Poincare MLR, the
    hyperbolic drop-in that keeps HALO's radius acquisition working on a
    transformer backbone."""

    reduced_channels: int = 64
    curvature: float = 1.0

    @nn.compact
    def __call__(self, feats, size: Optional[Tuple[int, int]] = None,
                 train: bool = True):
        fused = self._fuse(feats, train)
        y = nn.Dropout(self.dropout, deterministic=not train)(fused)
        y = nn.Conv(self.reduced_channels, (1, 1), dtype=self.dtype,
                    name="conv_reduce")(y)
        embed = hyp.expmap(y.astype(jnp.float32), c=self.curvature, axis=-1)
        out = HyperMLRHead(self.num_classes, self.reduced_channels,
                           c=self.curvature, name="mlr")(embed)
        if size is not None:
            out = resize_bilinear(out, size)
        return out, embed
