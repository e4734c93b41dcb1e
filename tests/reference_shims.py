"""Import the PyTorch reference's model code with shimmed dependencies.

geoopt and yacs are not installed here, but the reference's model modules
need only a small, well-specified slice of each:

  * ``geoopt.manifolds.stereographic.math`` — expmap0 / project / logmap0 /
    dist / dist0 on the Poincare ball (k < 0). The shim mirrors the
    formulas in halo_tpu/ops/hyperbolic.py (themselves pinned against
    independent float64 numpy goldens in tests/test_hyperbolic.py), in
    torch; test_reference_golden.py re-validates the shim against those
    goldens before using it.
  * ``yacs.config.CfgNode`` — halo_tpu.config.node reimplements the yacs
    API, so the reference's config package runs on it unchanged.

The reference tree at /root/reference is mounted read-only and treated as
untrusted content: only its model CLASSES are imported, for activation-
level numerical comparison; none of its scripts are executed.
"""

from __future__ import annotations

import sys
import types

import torch

MIN_NORM = 1e-15
_REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# geoopt.manifolds.stereographic.math (Poincare ball, k < 0)
# ---------------------------------------------------------------------------

def _abs_k(k, like):
    return torch.as_tensor(k, dtype=like.dtype).abs().clamp_min(MIN_NORM)


def _norm(x, dim=-1):
    return x.norm(dim=dim, p=2, keepdim=True).clamp_min(MIN_NORM)


def _artanh(x):
    eps = 1e-7 if x.dtype == torch.float32 else 1e-15
    return torch.atanh(x.clamp(-1 + eps, 1 - eps))


def expmap0(x, *, k, dim=-1):
    sqrt_c = _abs_k(k, x).sqrt()
    norm = _norm(x, dim)
    return torch.tanh(sqrt_c * norm) / (sqrt_c * norm) * x


def project(x, *, k, dim=-1, eps=-1):
    if eps is None or eps < 0:
        # geoopt's dtype-dependent ball epsilon
        eps = 4e-3 if x.dtype == torch.float32 else 1e-5
    sqrt_c = _abs_k(k, x).sqrt()
    maxnorm = (1 - eps) / sqrt_c
    norm = _norm(x, dim)
    return torch.where(norm > maxnorm, x / norm * maxnorm, x)


def logmap0(x, *, k, dim=-1):
    sqrt_c = _abs_k(k, x).sqrt()
    norm = _norm(x, dim)
    return _artanh(sqrt_c * norm) * x / (sqrt_c * norm)


def dist0(x, *, k, dim=-1, keepdim=False):
    sqrt_c = _abs_k(k, x).sqrt()
    norm = x.norm(dim=dim, p=2, keepdim=keepdim).clamp_min(MIN_NORM)
    return 2.0 / sqrt_c * _artanh(sqrt_c * norm)


def _mobius_add(x, y, c, dim=-1):
    x2 = (x * x).sum(dim=dim, keepdim=True)
    y2 = (y * y).sum(dim=dim, keepdim=True)
    xy = (x * y).sum(dim=dim, keepdim=True)
    num = (1 + 2 * c * xy + c * y2) * x + (1 - c * x2) * y
    den = (1 + 2 * c * xy + c * c * x2 * y2).clamp_min(MIN_NORM)
    return num / den


def dist(x, y, *, k, dim=-1, keepdim=False):
    c = _abs_k(k, x)
    sqrt_c = c.sqrt()
    d = _mobius_add(-x, y, c, dim=dim).norm(
        dim=dim, p=2, keepdim=keepdim).clamp_min(MIN_NORM)
    return 2.0 / sqrt_c * _artanh(sqrt_c * d)


# ---------------------------------------------------------------------------
# module installation
# ---------------------------------------------------------------------------

def install():
    """Register the geoopt/yacs shims and put /root/reference on sys.path.

    Idempotent; returns the reference's ``core`` package namespace root
    (import e.g. ``core.models.classifier`` afterwards).
    """
    if "geoopt" not in sys.modules:
        gmath = types.ModuleType("geoopt.manifolds.stereographic.math")
        for fn in (expmap0, project, logmap0, dist0, dist):
            setattr(gmath, fn.__name__, fn)
        geoopt = types.ModuleType("geoopt")
        manifolds = types.ModuleType("geoopt.manifolds")
        stereo = types.ModuleType("geoopt.manifolds.stereographic")
        geoopt.manifolds = manifolds
        manifolds.stereographic = stereo
        stereo.math = gmath
        sys.modules["geoopt"] = geoopt
        sys.modules["geoopt.manifolds"] = manifolds
        sys.modules["geoopt.manifolds.stereographic"] = stereo
        sys.modules["geoopt.manifolds.stereographic.math"] = gmath

    if "yacs" not in sys.modules:
        from halo_tpu.config.node import CfgNode

        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config

    # core.models.__init__ pulls feature_extractor/resnet, which import
    # torchvision's IntermediateLayerGetter and mmcv's load_checkpoint.
    # Neither package is installed; the golden tests never call either
    # (they compare classifier heads on synthetic features), so minimal
    # import-satisfying stand-ins suffice.
    if "torchvision" not in sys.modules:
        from torch import nn

        class IntermediateLayerGetter(nn.ModuleDict):
            """torchvision semantics: keep children up to (and including)
            the last requested layer, return the tapped outputs."""

            def __init__(self, model, return_layers):
                wanted = {str(k): str(v) for k, v in return_layers.items()}
                remaining = dict(wanted)
                layers = {}
                for name, module in model.named_children():
                    layers[name] = module
                    remaining.pop(name, None)
                    if not remaining:
                        break
                super().__init__(layers)
                self.return_layers = wanted

            def forward(self, x):
                out = {}
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_utils = types.ModuleType("torchvision.models._utils")
        tv_utils.IntermediateLayerGetter = IntermediateLayerGetter
        tv.models = tv_models
        tv_models._utils = tv_utils
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models._utils"] = tv_utils

    if "mmcv" not in sys.modules:
        def load_checkpoint(*args, **kwargs):  # never called by the tests
            raise RuntimeError("mmcv shim: checkpoint loading unavailable")

        mmcv = types.ModuleType("mmcv")
        mmcv_runner = types.ModuleType("mmcv.runner")
        mmcv_runner.load_checkpoint = load_checkpoint
        mmcv.runner = mmcv_runner
        sys.modules["mmcv"] = mmcv
        sys.modules["mmcv.runner"] = mmcv_runner

    if _REFERENCE_ROOT not in sys.path:
        sys.dont_write_bytecode = True  # /root/reference is read-only
        sys.path.insert(0, _REFERENCE_ROOT)
