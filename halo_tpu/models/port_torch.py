"""Torch checkpoint import: reference state_dicts -> flax param trees.

The reference loads ImageNet-pretrained torchvision ResNets and its own
Lightning ``.ckpt`` files by prefix-filtered state_dict
(reference: core/models/resnet.py:209-212, core/utils/misc.py:165-188).
This module maps those torch parameter names/layouts onto the halo_tpu
trees so pretrained and reference-trained checkpoints drop in:

  torch conv   (O, I, kh, kw)  -> flax kernel (kh, kw, I, O)
  torch depthwise (C, 1, k, k) -> flax kernel (k, k, 1, C)
  torch linear (O, I)          -> flax kernel (I, O)
  BN weight/bias/running_mean/running_var ->
      FrozenBatchNorm 'frozen' buffers, or nn.BatchNorm scale/bias +
      batch_stats mean/var.

Only numpy/flax at import time; torch is used purely as a deserializer.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# name translation
# ---------------------------------------------------------------------------

def _backbone_torch_to_flax(key: str):
    """torchvision resnet names -> our ResNetFeatures tree paths.

    'layer3.7.conv2.weight' -> ('layer3_7', 'conv2') conv kernel
    'layer1.0.downsample.0.weight' -> ('layer1_0', 'downsample_conv')
    """
    key = re.sub(r"^(backbone\.)", "", key)
    m = re.match(r"layer(\d+)\.(\d+)\.(.*)", key)
    if m:
        stage, block, rest = m.groups()
        base = (f"layer{stage}_{block}",)
        if rest.startswith("downsample.0."):
            return base + ("downsample_conv",), rest.split(".")[-1], "conv"
        if rest.startswith("downsample.1."):
            return base + ("downsample_bn",), rest.split(".")[-1], "bn"
        mod, leaf = rest.split(".", 1)
        kind = "conv" if mod.startswith("conv") else "bn"
        return base + (mod,), leaf, kind
    if key.startswith("conv1."):
        return ("conv1",), key.split(".", 1)[1], "conv"
    if key.startswith("bn1."):
        return ("bn1",), key.split(".", 1)[1], "bn"
    return None  # fc./avgpool – dropped (feature extractor taps only)


def _mit_torch_to_flax(key: str):
    """Official MiT (SegFormer, NVlabs) encoder names -> our
    MixVisionTransformer tree paths. The torch module fuses K and V into
    one ``kv`` linear; our EfficientAttention keeps separate ``k``/``v``
    Dense layers, so kv rows are split by the caller (kind 'kv').

    'block1.0.attn.q.weight'      -> ('block1_0', 'attn', 'q') linear
    'patch_embed2.proj.weight'    -> ('patch_embed2', 'proj') conv
    'block3.5.mlp.dwconv.dwconv.weight' -> ('block3_5','ffn','dwconv') dwconv
    """
    key = re.sub(r"^(backbone\.)", "", key)  # mmseg-style checkpoints
    m = re.match(r"patch_embed(\d)\.(proj|norm)\.(.*)", key)
    if m:
        s, mod, leaf = m.groups()
        kind = "conv" if mod == "proj" else "ln"
        return (f"patch_embed{s}", mod), leaf, kind
    m = re.match(r"norm(\d)\.(.*)", key)
    if m:
        return (f"norm{m.group(1)}",), m.group(2), "ln"
    m = re.match(r"block(\d)\.(\d+)\.(.*)", key)
    if not m:
        return None  # head.* (ImageNet classifier) — dropped
    s, b, rest = m.groups()
    base = (f"block{s}_{b}",)
    if rest.startswith("norm1.") or rest.startswith("norm2."):
        mod, leaf = rest.split(".", 1)
        return base + (mod,), leaf, "ln"
    if rest.startswith("attn."):
        rest = rest[len("attn."):]
        mod, leaf = rest.split(".", 1)
        table = {"q": (("attn", "q"), "linear"),
                 "kv": (("attn",), "kv"),      # split into k/v by caller
                 "proj": (("attn", "proj"), "linear"),
                 "sr": (("attn", "sr"), "conv"),
                 "norm": (("attn", "sr_norm"), "ln")}
        path, kind = table[mod]
        return base + path, leaf, kind
    if rest.startswith("mlp."):
        rest = rest[len("mlp."):]
        if rest.startswith("dwconv.dwconv."):
            return base + ("ffn", "dwconv"), rest.split(".")[-1], "conv"
        mod, leaf = rest.split(".", 1)
        return base + ("ffn", mod), leaf, "linear"
    return None


_SEP_LEAF = {"depthwise_conv": ("depthwise", "conv"),
             "depthwise_bn": ("depthwise", "norm"),
             "pointwise_conv": ("pointwise", "conv"),
             "pointwise_bn": ("pointwise", "norm")}


def _head_torch_to_flax(key: str, head: str):
    """Reference classifier names -> our head tree paths."""
    def sep(path_prefix, rest):
        mod, leaf = rest.split(".", 1)
        sub = _SEP_LEAF[mod]
        kind = "conv" if sub[1] == "conv" else "bn"
        return path_prefix + sub, leaf, kind

    if head in ("deeplabv2", "deeplabv2_hyper"):
        m = re.match(r"conv2d_list\.(\d+)\.(.*)", key)
        if m:
            return (f"aspp_{m.group(1)}",), m.group(2), "conv"
        if key.startswith("conv_seg.P_MLR"):
            return ("mlr",), "p_mlr", "raw"
        if key.startswith("conv_seg.A_MLR"):
            return ("mlr",), "a_mlr", "raw"
        return None

    # deeplabv3plus variants
    m = re.match(r"parallel_branches\.(\d+)\.(.*)", key)
    if m:
        idx, rest = m.groups()
        if idx == "0":  # Sequential(conv, bn, relu)
            mod, leaf = rest.split(".", 1)
            return (("aspp", "branch_0", "conv") if mod == "0"
                    else ("aspp", "branch_0", "norm")), leaf, \
                ("conv" if mod == "0" else "bn")
        return sep(("aspp", f"branch_{idx}"), rest)
    if key.startswith("global_branch."):
        mod, leaf = key.split(".")[1], key.split(".", 2)[2]
        return (("aspp", "global_branch", "conv") if mod == "1"
                else ("aspp", "global_branch", "norm")), leaf, \
            ("conv" if mod == "1" else "bn")
    if key.startswith("bottleneck."):
        mod, leaf = key.split(".")[1], key.split(".", 2)[2]
        return (("aspp", "bottleneck", "conv") if mod == "0"
                else ("aspp", "bottleneck", "norm")), leaf, \
            ("conv" if mod == "0" else "bn")
    if key.startswith("shortcut."):
        mod, leaf = key.split(".")[1], key.split(".", 2)[2]
        return (("aspp", "shortcut", "conv") if mod == "0"
                else ("aspp", "shortcut", "norm")), leaf, \
            ("conv" if mod == "0" else "bn")
    m = re.match(r"decoder\.(\d+)\.(.*)", key)
    if m:
        idx, rest = m.groups()
        if rest.split(".")[0] in _SEP_LEAF:
            return sep(("aspp", f"decoder_{idx}"), rest)
        # old_decoder tail: decoder.3 = cls conv (Euclidean v3+)
        return ("cls_conv",), rest.split(".")[-1], "conv"
    if key.startswith("conv_reduce."):
        return ("conv_reduce",), key.split(".", 1)[1], "conv"
    if key.startswith("cls_conv."):
        return ("cls_conv",), key.split(".")[-1], "conv"
    if key.startswith("wn_mlp."):
        mod, leaf = key.split(".")[1], key.split(".", 2)[2]
        table = {"0": ("hfr", "fc1", "linear"),
                 "1": ("hfr", "bn", "bn1d"),
                 "3": ("hfr", "fc2", "linear")}
        path0, path1, kind = table[mod]
        return (path0, path1), leaf, kind
    if key.startswith("conv_seg.P_MLR"):
        return ("mlr",), "p_mlr", "raw"
    if key.startswith("conv_seg.A_MLR"):
        return ("mlr",), "a_mlr", "raw"
    return None


# ---------------------------------------------------------------------------
# tree surgery
# ---------------------------------------------------------------------------

def _set(tree: Dict, path: Tuple[str, ...], leaf: str, value):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def _convert(value: np.ndarray, leaf: str, kind: str):
    v = np.asarray(value)
    if kind in ("conv",):
        if leaf == "weight":
            return ("kernel", v.transpose(2, 3, 1, 0))
        return ("bias", v)
    if kind == "linear":
        if leaf == "weight":
            return ("kernel", v.T)
        return ("bias", v)
    if kind == "ln":  # LayerNorm: torch weight -> flax scale
        return ("scale" if leaf == "weight" else "bias", v)
    if kind == "raw":
        return (leaf, v)
    return (leaf, v)  # bn leaves keep torch names; resolved by collection


def torch_state_dict_to_variables(state_dict: Dict[str, Any], module: str,
                                  head: str = "deeplabv3plus",
                                  freeze_bn: bool = True) -> Dict:
    """Convert a (possibly prefixed) torch state_dict into partial
    {'params', 'frozen', 'batch_stats'} trees for one submodule.

    ``module``: 'feature_extractor' or 'classifier'.
    """
    params: Dict = {}
    frozen: Dict = {}
    stats: Dict = {}

    is_mit = any("patch_embed" in k for k in state_dict)

    for key, value in state_dict.items():
        if key.startswith(module + "."):
            key = key[len(module) + 1:]
        elif any(key.startswith(p + ".") for p in
                 ("feature_extractor", "classifier")):
            continue  # belongs to the other module
        if key.endswith("num_batches_tracked"):
            continue

        if module == "feature_extractor":
            hit = (_mit_torch_to_flax(key) if is_mit
                   else _backbone_torch_to_flax(key))
        else:
            hit = _head_torch_to_flax(key, head)
        if hit is None:
            continue
        path, leaf, kind = hit
        value = np.asarray(value)

        if kind == "kv":
            # torch fuses K/V into one (2C, C) linear; split into our
            # separate k/v Dense layers.
            half = value.shape[0] // 2
            name, vk = _convert(value[:half], leaf, "linear")
            _, vv = _convert(value[half:], leaf, "linear")
            _set(params, path + ("k",), name, vk)
            _set(params, path + ("v",), name, vv)
        elif kind in ("conv", "linear", "raw", "ln"):
            name, v = _convert(value, leaf, kind)
            _set(params, path, name, v)
        elif kind in ("bn", "bn1d"):
            if freeze_bn and kind == "bn":
                _set(frozen, path, {"weight": "weight", "bias": "bias",
                                    "running_mean": "running_mean",
                                    "running_var": "running_var"}[leaf],
                     value)
            else:
                # Live BN target scope: layers.BatchNorm (the torch-
                # momentum wrapper used for trunk BN) nests a flax
                # nn.BatchNorm under a 'bn' child scope, but 'bn1d'
                # paths (HFR's wn_mlp) already name a RAW nn.BatchNorm
                # scope — appending another 'bn' would strand the
                # tensors at hfr/bn/bn/* with the model at hfr/bn/*.
                tgt = path if kind == "bn1d" else path + ("bn",)
                if leaf == "weight":
                    _set(params, tgt, "scale", value)
                elif leaf == "bias":
                    _set(params, tgt, "bias", value)
                elif leaf == "running_mean":
                    _set(stats, tgt, "mean", value)
                elif leaf == "running_var":
                    _set(stats, tgt, "var", value)
    return {"params": params, "frozen": frozen, "batch_stats": stats}


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a torch .pth/.ckpt (Lightning or plain) into numpy arrays
    (reference loader behavior: core/utils/misc.py:165-178)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in blob.items()}


def _deep_update(dst, src, label="", strict=False, _unmatched=None):
    """Merge ``src`` leaves into ``dst`` in place. ``strict=True``
    collects (and the top-level call raises on) paths absent from
    ``dst`` instead of silently inserting them — inserting new keys into
    a params tree corrupts it against the already-built opt_state and
    surfaces as an opaque pytree mismatch in the first train step."""
    top = _unmatched is None
    if _unmatched is None:
        _unmatched = []
    for k, v in src.items():
        if isinstance(v, dict) and k in dst and isinstance(dst[k], dict):
            _deep_update(dst[k], v, label + "/" + str(k), strict,
                         _unmatched)
        elif k not in dst and strict:
            _unmatched.append(label + "/" + str(k))
        else:
            if k in dst and hasattr(dst[k], "shape"):
                if tuple(dst[k].shape) != tuple(np.shape(v)):
                    raise ValueError(
                        f"shape mismatch at {label}/{k}: "
                        f"{dst[k].shape} vs {np.shape(v)}")
                v = np.asarray(v, dst[k].dtype) if hasattr(
                    dst[k], "dtype") else v
            dst[k] = v
    if top and _unmatched:
        raise ValueError(
            f"{len(_unmatched)} checkpoint tensors have no destination in "
            f"the model tree (wrong MODEL.NAME for these weights?): "
            f"{_unmatched[:8]}{'...' if len(_unmatched) > 8 else ''}")


def resolve_pretrained_weights(spec: str) -> Optional[str]:
    """Resolve MODEL.WEIGHTS to a local file path.

    '' -> None (skip). A filesystem path -> itself (FileNotFoundError if
    absent). A URL -> torch-hub cache lookup by basename
    ($TORCH_HOME/hub/checkpoints, like torchvision's downloader uses) —
    RuntimeError with a pre-download hint if not cached, because TPU pods
    often run without egress and silently training the trunk from random
    init would wreck mIoU parity (the reference auto-downloads at build,
    core/models/resnet.py:209-212).
    """
    spec = str(spec or "")
    if not spec:
        return None
    if "://" not in spec:
        if not os.path.exists(spec):
            raise FileNotFoundError(
                f"MODEL.WEIGHTS points at a missing file: {spec}")
        return spec
    name = spec.rsplit("/", 1)[-1]
    torch_home = os.environ.get(
        "TORCH_HOME", os.path.join(os.path.expanduser("~"), ".cache",
                                   "torch"))
    candidates = [
        os.path.join(torch_home, "hub", "checkpoints", name),
        os.path.join(torch_home, "checkpoints", name),
    ]
    for c in candidates:
        if os.path.exists(c):
            return c
    raise RuntimeError(
        f"MODEL.WEIGHTS is a URL ({spec}) but {name} is not in the torch "
        f"hub cache ({candidates[0]}). Pre-download it on a host with "
        "network access, or set MODEL.WEIGHTS to a local path / '' to "
        "skip pretrained initialization.")


def load_pretrained_backbone(state, spec: str):
    """Load an ImageNet trunk (torchvision ResNet or official MiT) into
    state.params['feature_extractor'] from MODEL.WEIGHTS — the build-time
    auto-load of the reference (core/models/resnet.py:209-212). No-op when
    spec is empty."""
    path = resolve_pretrained_weights(spec)
    if path is None:
        return state
    return load_torch_module_params(state, path, "feature_extractor",
                                    strict=True)


def load_torch_module_params(state, path: str, module: str,
                             strict: bool = False):
    """Merge one module's params from a torch checkpoint into a TrainState.

    ``strict``: every converted tensor must land on an existing leaf
    (used for MODEL.WEIGHTS trunk loading, where a silent miss would
    train from random init and wreck mIoU parity). Both modes error when
    NOTHING matches."""
    import jax

    sd = load_torch_checkpoint(path)
    # Heuristics for the head variant from the present keys.
    head = "deeplabv2" if any(
        k.split(f"{module}.")[-1].startswith("conv2d_list")
        for k in sd) else "deeplabv3plus"
    freeze_bn = bool(state.frozen)
    converted = torch_state_dict_to_variables(sd, module, head=head,
                                              freeze_bn=freeze_bn)

    def to_host(tree):
        return jax.tree_util.tree_map(np.asarray, tree)

    n_conv = sum(len(jax.tree_util.tree_leaves(converted[c]))
                 for c in ("params", "frozen", "batch_stats"))
    if n_conv == 0:
        raise RuntimeError(
            f"{path}: no checkpoint keys matched module '{module}' — the "
            "checkpoint layout is not one this importer recognizes "
            "(expected torchvision ResNet, official/mmseg MiT, or a "
            "reference feature_extractor./classifier. state_dict). "
            "Refusing to continue from random init.")

    params = to_host(state.params)
    frozen = to_host(state.frozen) if state.frozen else {}
    stats = to_host(state.batch_stats) if state.batch_stats else {}
    if converted["params"]:
        _deep_update(params.setdefault(module, {}), converted["params"],
                     module, strict=strict)
    if converted["frozen"] and frozen:
        _deep_update(frozen.setdefault(module, {}), converted["frozen"],
                     module, strict=strict)
    if converted["batch_stats"] and stats:
        _deep_update(stats.setdefault(module, {}),
                     converted["batch_stats"], module, strict=strict)
    print(f"loaded {n_conv} tensors into {module} from {path}",
          flush=True)
    return state.replace(params=params, frozen=frozen, batch_stats=stats)
