"""Activation-level parity against the REAL reference classifier heads.

Instantiates the reference's four head variants (PyTorch, random init,
imported via tests/reference_shims.py) and asserts that porting their
state_dicts through halo_tpu.models.port_torch reproduces their logits and
ball embeddings in our flax heads at float32 tolerance — the strongest
available mIoU-parity evidence without trained weights (reference heads:
core/models/classifier.py:10-569).

Shim validation comes first: the torch gmath shim must agree with the
independent float64 numpy goldens of tests/test_hyperbolic.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests import reference_shims
from tests.test_hyperbolic import (np_dist0, np_expmap0, np_mlr_naive,
                                   np_project)
from halo_tpu.models.classifier import (ASPPv2Head, ASPPv2HyperHead,
                                        SeparableASPPHead,
                                        SeparableASPPHyperHead)
from halo_tpu.models.port_torch import torch_state_dict_to_variables

reference_shims.install()


# ---------------------------------------------------------------------------
# shim validation against the independent f64 numpy goldens
# ---------------------------------------------------------------------------

def test_gmath_shim_matches_numpy_goldens():
    rng = np.random.default_rng(0)
    u = rng.normal(size=(64, 16)) * 2.0
    k = torch.tensor(-1.0, dtype=torch.float64)
    tu = torch.from_numpy(u)

    got = reference_shims.expmap0(tu, k=k).numpy()
    np.testing.assert_allclose(got, np_expmap0(u), rtol=1e-12)

    ball = np_project(np_expmap0(u))
    got = reference_shims.project(
        reference_shims.expmap0(tu, k=k), k=k).numpy()
    np.testing.assert_allclose(got, ball, rtol=1e-12)

    got = reference_shims.dist0(torch.from_numpy(ball), k=k).numpy()
    np.testing.assert_allclose(got, np_dist0(ball), rtol=1e-10)


def test_reference_hypermlr_matches_naive_mobius():
    """The imported reference HyperMLR (conv form, f64) must agree with the
    independent per-pixel Mobius-addition golden — validating both the shim
    and our reading of the reference head's math."""
    from core.utils.hyperbolic import HyperMLR

    rng = np.random.default_rng(1)
    n, C, O = 40, 16, 19
    x = np_project(np_expmap0(rng.normal(size=(n, C)) * 0.7))
    torch.manual_seed(0)
    mlr = HyperMLR(C, O, c=1.0)
    p = mlr.P_MLR.detach().numpy()
    a = mlr.A_MLR.detach().numpy()

    # conv form wants (B, C, H, W)
    xt = torch.from_numpy(x.T[None, :, :, None])  # (1, C, n, 1)
    with torch.no_grad():
        out = mlr(xt).numpy()[0, :, :, 0].T      # (n, O)
    want = np_mlr_naive(x, p, a)
    np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-8)


# ---------------------------------------------------------------------------
# full-head activation parity (torch reference -> port -> flax)
# ---------------------------------------------------------------------------

def _ref_cfg(curvature=1.0):
    from core.configs import cfg as ref_cfg
    ref_cfg.MODEL.CURVATURE = curvature
    return ref_cfg


def _feats(rng, h=8, w=16):
    out = rng.normal(size=(1, 2048, h, w)).astype(np.float32)
    low = rng.normal(size=(1, 256, 2 * h, 2 * w)).astype(np.float32)
    return out, low


def _to_nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _randomize_bn1d(module, seed=7):
    """Randomize every live BatchNorm1d (HFR's wn_mlp): at torch defaults
    (weight=1, bias=0, mean=0, var=1) flax inits identically, so a port
    that silently fails to transfer these tensors still passes — exactly
    the blind spot that hid the hfr/bn/bn double-scope mapping bug."""
    gen = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.weight.data.normal_(1.0, 0.2, generator=gen)
            m.bias.data.normal_(0.0, 0.2, generator=gen)
            m.running_mean.normal_(0.0, 0.2, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)


def _port_and_apply(head, sd, feats_nhwc, head_kind, freeze_bn):
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        feats_nhwc, train=False)
    converted = torch_state_dict_to_variables(
        sd, "classifier", head=head_kind, freeze_bn=freeze_bn)
    from halo_tpu.models.port_torch import _deep_update
    variables = jax.tree_util.tree_map(np.asarray, variables)
    _deep_update(variables["params"], converted["params"], "params")
    if converted["frozen"] and "frozen" in variables:
        _deep_update(variables["frozen"], converted["frozen"], "frozen")
    if converted["batch_stats"] and "batch_stats" in variables:
        _deep_update(variables["batch_stats"], converted["batch_stats"],
                     "stats")
    return head.apply(variables, feats_nhwc, train=False)


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_reference_golden_resnet101_trunk(tmp_path):
    """MODEL.WEIGHTS round trip: a torch ResNet-101 state_dict (the
    reference's dilated trunk, core/models/resnet.py:115-294) ports into
    our NHWC Flax backbone and reproduces the tapped 'low'/'out'
    activations (reference taps: core/models/feature_extractor.py:17-20)."""
    from core.models import resnet as ref_resnet
    from core.models.layers import FrozenBatchNorm2d
    from halo_tpu.models.resnet import resnet_feature_extractor
    from halo_tpu.models.port_torch import (load_torch_checkpoint,
                                            _deep_update)

    torch.manual_seed(0)
    trunk = ref_resnet.resnet101(
        pretrained=False, pretrained_weights=None,
        replace_stride_with_dilation=[False, True, True],
        norm_layer=FrozenBatchNorm2d)
    # randomize frozen-BN buffers so stat porting is actually exercised
    gen = torch.Generator().manual_seed(1)
    for m in trunk.modules():
        if isinstance(m, FrozenBatchNorm2d):
            for name in ("weight", "bias", "running_mean"):
                getattr(m, name).normal_(0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)
    trunk.eval()

    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 3, 64, 128)).astype(np.float32)
    with torch.no_grad():
        y = torch.relu(trunk.bn1(trunk.conv1(torch.from_numpy(x))))
        y = trunk.maxpool(y)
        low = trunk.layer1(y)
        out = trunk.layer4(trunk.layer3(trunk.layer2(low)))

    ckpt = str(tmp_path / "trunk.pth")
    torch.save(trunk.state_dict(), ckpt)

    fe = resnet_feature_extractor("resnet101", freeze_bn=True)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = fe.init({"params": jax.random.PRNGKey(0)}, x_nhwc,
                        train=False)
    from halo_tpu.models.port_torch import torch_state_dict_to_variables
    converted = torch_state_dict_to_variables(
        load_torch_checkpoint(ckpt), "feature_extractor", freeze_bn=True)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    _deep_update(variables["params"], converted["params"], "params")
    _deep_update(variables["frozen"], converted["frozen"], "frozen")
    feats = fe.apply(variables, x_nhwc, train=False)

    np.testing.assert_allclose(_nchw(feats["low"]), low.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(_nchw(feats["out"]), out.numpy(),
                               rtol=1e-3, atol=1e-3)


def test_resolve_pretrained_weights(tmp_path, monkeypatch):
    """MODEL.WEIGHTS resolution: '' skips, local path loads (or errors if
    missing), URL requires the torch-hub cache (zero-egress safety)."""
    from halo_tpu.models.port_torch import resolve_pretrained_weights

    assert resolve_pretrained_weights("") is None
    p = tmp_path / "w.pth"
    p.write_bytes(b"x")
    assert resolve_pretrained_weights(str(p)) == str(p)
    with pytest.raises(FileNotFoundError):
        resolve_pretrained_weights(str(tmp_path / "missing.pth"))

    url = "https://download.pytorch.org/models/resnet101-5d3b4d8f.pth"
    monkeypatch.setenv("TORCH_HOME", str(tmp_path / "torch"))
    with pytest.raises(RuntimeError, match="hub cache"):
        resolve_pretrained_weights(url)
    cache = tmp_path / "torch" / "hub" / "checkpoints"
    cache.mkdir(parents=True)
    (cache / "resnet101-5d3b4d8f.pth").write_bytes(b"x")
    assert resolve_pretrained_weights(url) == str(
        cache / "resnet101-5d3b4d8f.pth")


def test_mit_state_dict_port_layout():
    """Official MiT (NVlabs SegFormer) state_dict names port onto our
    MixVisionTransformer tree: q/kv/proj/sr linears, dwconv, layer norms,
    with kv split into separate k/v kernels."""
    from halo_tpu.models.port_torch import torch_state_dict_to_variables

    C1, C2 = 16, 32
    rng = np.random.default_rng(7)
    sd = {
        "patch_embed1.proj.weight": rng.normal(size=(C1, 3, 7, 7)),
        "patch_embed1.proj.bias": rng.normal(size=(C1,)),
        "patch_embed1.norm.weight": rng.normal(size=(C1,)),
        "patch_embed1.norm.bias": rng.normal(size=(C1,)),
        "block1.0.norm1.weight": rng.normal(size=(C1,)),
        "block1.0.attn.q.weight": rng.normal(size=(C1, C1)),
        "block1.0.attn.kv.weight": rng.normal(size=(2 * C1, C1)),
        "block1.0.attn.kv.bias": rng.normal(size=(2 * C1,)),
        "block1.0.attn.proj.weight": rng.normal(size=(C1, C1)),
        "block1.0.attn.sr.weight": rng.normal(size=(C1, C1, 8, 8)),
        "block1.0.attn.norm.weight": rng.normal(size=(C1,)),
        "block1.0.mlp.fc1.weight": rng.normal(size=(4 * C1, C1)),
        "block1.0.mlp.dwconv.dwconv.weight": rng.normal(
            size=(4 * C1, 1, 3, 3)),
        "block1.0.mlp.fc2.weight": rng.normal(size=(C1, 4 * C1)),
        "norm1.weight": rng.normal(size=(C1,)),
        "norm2.weight": rng.normal(size=(C2,)),
        "head.weight": rng.normal(size=(1000, C2)),  # dropped
    }
    out = torch_state_dict_to_variables(sd, "feature_extractor")
    params = out["params"]
    b = params["block1_0"]
    np.testing.assert_array_equal(b["attn"]["q"]["kernel"],
                                  sd["block1.0.attn.q.weight"].T)
    np.testing.assert_array_equal(b["attn"]["k"]["kernel"],
                                  sd["block1.0.attn.kv.weight"][:C1].T)
    np.testing.assert_array_equal(b["attn"]["v"]["kernel"],
                                  sd["block1.0.attn.kv.weight"][C1:].T)
    np.testing.assert_array_equal(b["attn"]["k"]["bias"],
                                  sd["block1.0.attn.kv.bias"][:C1])
    np.testing.assert_array_equal(
        b["attn"]["sr"]["kernel"],
        sd["block1.0.attn.sr.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(b["attn"]["sr_norm"]["scale"],
                                  sd["block1.0.attn.norm.weight"])
    np.testing.assert_array_equal(
        b["ffn"]["dwconv"]["kernel"],
        sd["block1.0.mlp.dwconv.dwconv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(b["norm1"]["scale"],
                                  sd["block1.0.norm1.weight"])
    np.testing.assert_array_equal(
        params["patch_embed1"]["proj"]["kernel"],
        sd["patch_embed1.proj.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(params["norm1"]["scale"],
                                  sd["norm1.weight"])
    assert "head" not in params


class _TorchMiT(torch.nn.Module):
    """Minimal torch replica of the OFFICIAL MiT encoder layout (NVlabs
    SegFormer; the reference's `segformer` branch backbone, README.md:
    104-116) — exact module names, kv fusion, reshape orders, LayerNorm
    epsilons and erf-GELU — so a random state_dict from it is
    indistinguishable from a real MiT checkpoint for porting purposes."""

    def __init__(self, embed_dims=(16, 32, 64, 128), depths=(1, 1, 1, 1),
                 heads=(1, 2, 4, 8), sr_ratios=(8, 4, 2, 1), mlp_ratio=4):
        super().__init__()
        import torch.nn as nn

        class Attention(nn.Module):
            def __init__(self, dim, num_heads, sr_ratio):
                super().__init__()
                self.num_heads = num_heads
                self.q = nn.Linear(dim, dim)
                self.kv = nn.Linear(dim, dim * 2)
                self.proj = nn.Linear(dim, dim)
                self.sr_ratio = sr_ratio
                if sr_ratio > 1:
                    self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
                    self.norm = nn.LayerNorm(dim)

            def forward(self, x, H, W):
                B, N, C = x.shape
                h = self.num_heads
                q = self.q(x).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
                if self.sr_ratio > 1:
                    x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
                    x_ = self.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
                    x_ = self.norm(x_)
                else:
                    x_ = x
                kv = self.kv(x_).reshape(B, -1, 2, h, C // h).permute(
                    2, 0, 3, 1, 4)
                k, v = kv[0], kv[1]
                attn = (q @ k.transpose(-2, -1)) * (C // h) ** -0.5
                attn = attn.softmax(dim=-1)
                out = (attn @ v).transpose(1, 2).reshape(B, N, C)
                return self.proj(out)

        class DWConv(nn.Module):
            def __init__(self, dim):
                super().__init__()
                self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

            def forward(self, x, H, W):
                B, N, C = x.shape
                x = x.transpose(1, 2).view(B, C, H, W)
                x = self.dwconv(x)
                return x.flatten(2).transpose(1, 2)

        class Mlp(nn.Module):
            def __init__(self, dim, hidden):
                super().__init__()
                self.fc1 = nn.Linear(dim, hidden)
                self.dwconv = DWConv(hidden)
                self.act = nn.GELU()
                self.fc2 = nn.Linear(hidden, dim)

            def forward(self, x, H, W):
                return self.fc2(self.act(self.dwconv(self.fc1(x), H, W)))

        class Block(nn.Module):
            def __init__(self, dim, num_heads, sr_ratio, mlp_ratio):
                super().__init__()
                self.norm1 = nn.LayerNorm(dim, eps=1e-6)
                self.attn = Attention(dim, num_heads, sr_ratio)
                self.norm2 = nn.LayerNorm(dim, eps=1e-6)
                self.mlp = Mlp(dim, dim * mlp_ratio)

            def forward(self, x, H, W):
                x = x + self.attn(self.norm1(x), H, W)
                x = x + self.mlp(self.norm2(x), H, W)
                return x

        class OverlapPatchEmbed(nn.Module):
            def __init__(self, patch, stride, in_c, dim):
                super().__init__()
                self.proj = nn.Conv2d(in_c, dim, patch, stride, patch // 2)
                self.norm = nn.LayerNorm(dim)

            def forward(self, x):
                x = self.proj(x)
                _, _, H, W = x.shape
                x = x.flatten(2).transpose(1, 2)
                return self.norm(x), H, W

        in_c = 3
        for s in range(4):
            setattr(self, f"patch_embed{s + 1}", OverlapPatchEmbed(
                7 if s == 0 else 3, 4 if s == 0 else 2, in_c,
                embed_dims[s]))
            setattr(self, f"block{s + 1}", nn.ModuleList(
                [Block(embed_dims[s], heads[s], sr_ratios[s], mlp_ratio)
                 for _ in range(depths[s])]))
            setattr(self, f"norm{s + 1}", nn.LayerNorm(embed_dims[s],
                                                       eps=1e-6))
            in_c = embed_dims[s]

    def forward(self, x):
        outs = []
        B = x.shape[0]
        for s in range(4):
            x, H, W = getattr(self, f"patch_embed{s + 1}")(x)
            for blk in getattr(self, f"block{s + 1}"):
                x = blk(x, H, W)
            x = getattr(self, f"norm{s + 1}")(x)
            outs.append(x.reshape(B, H, W, -1).permute(0, 3, 1, 2))
            x = outs[-1]
        return outs


def test_reference_golden_mit_trunk():
    """Official-layout MiT state_dict -> port_torch -> our
    MixVisionTransformer reproduces all four stage maps: validates the kv
    split, attention head reshape order, SR conv+LN, MixFFN dwconv, and
    patch-embed semantics the SegFormer checkpoint import depends on
    (BASELINE.json config #5)."""
    from halo_tpu.models.port_torch import (torch_state_dict_to_variables,
                                            _deep_update)
    from halo_tpu.models.segformer import MIT_ARCHS, MixVisionTransformer

    arch = MIT_ARCHS["mittiny"]
    torch.manual_seed(0)
    ref = _TorchMiT(embed_dims=arch["embed_dims"], depths=arch["depths"],
                    heads=arch["heads"])
    ref.eval()
    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 3, 64, 128)).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(torch.from_numpy(x))]

    ours = MixVisionTransformer(**arch)
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    variables = ours.init({"params": jax.random.PRNGKey(0)}, x_nhwc,
                          train=False)
    converted = torch_state_dict_to_variables(ref.state_dict(),
                                              "feature_extractor")
    variables = jax.tree_util.tree_map(np.asarray, variables)
    _deep_update(variables["params"], converted["params"], "params")
    feats = ours.apply(variables, x_nhwc, train=False)

    for s in range(4):
        got = np.transpose(np.asarray(feats[f"c{s + 1}"]), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want[s], rtol=2e-3, atol=2e-4,
                                   err_msg=f"stage {s + 1}")


def test_reference_golden_v2_euclid():
    """ASPP_Classifier_V2 (reference :10-37) vs ASPPv2Head."""
    from core.models.classifier import ASPP_Classifier_V2

    torch.manual_seed(0)
    ref = ASPP_Classifier_V2(2048, [6, 12, 18, 24], [6, 12, 18, 24], 19)
    ref.eval()
    rng = np.random.default_rng(2)
    out, low = _feats(rng)
    with torch.no_grad():
        want = ref({"out": torch.from_numpy(out)}).numpy()

    head = ASPPv2Head(num_classes=19)
    got, aux = _port_and_apply(head, ref.state_dict(),
                               {"out": _to_nhwc(out)}, "deeplabv2", False)
    assert aux is None
    np.testing.assert_allclose(_nchw(got), want, rtol=1e-4, atol=1e-4)


def test_reference_golden_v2_hyper():
    """ASPP_Classifier_V2_Hyper (reference :333-379) vs ASPPv2HyperHead:
    logits + ball embedding, f32 vs the reference's f64 head."""
    from core.models.classifier import ASPP_Classifier_V2_Hyper

    _ref_cfg(1.0)
    torch.manual_seed(0)
    ref = ASPP_Classifier_V2_Hyper(2048, [6, 12, 18, 24], [6, 12, 18, 24],
                                   19, reduced_channels=16)
    ref.eval()
    rng = np.random.default_rng(3)
    out, low = _feats(rng)
    with torch.no_grad():
        want_logits, want_embed = ref({"out": torch.from_numpy(out)})
    want_logits = want_logits.numpy()
    want_embed = want_embed.numpy()

    head = ASPPv2HyperHead(num_classes=19, reduced_channels=16)
    got_logits, got_embed = _port_and_apply(
        head, ref.state_dict(), {"out": _to_nhwc(out)}, "deeplabv2", False)
    np.testing.assert_allclose(_nchw(got_embed), want_embed,
                               rtol=2e-3, atol=2e-5)
    np.testing.assert_allclose(_nchw(got_logits), want_logits,
                               rtol=2e-3, atol=2e-3)
    # selection-relevant: pixel argmax agreement
    agree = (np.argmax(_nchw(got_logits), 1)
             == np.argmax(want_logits, 1)).mean()
    assert agree > 0.999


@pytest.mark.parametrize("hfr,reduced", [(False, 512), (False, 64),
                                         (True, 64)])
def test_reference_golden_v3plus_euclid(hfr, reduced):
    """DepthwiseSeparableASPP (reference :88-328) vs SeparableASPPHead,
    covering old_decoder (512, no hfr), channel-reduce, and HFR paths."""
    from core.models.classifier import DepthwiseSeparableASPP
    from core.models.layers import FrozenBatchNorm2d

    torch.manual_seed(0)
    ref = DepthwiseSeparableASPP(
        inplanes=2048, dilation_series=[1, 6, 12, 18],
        padding_series=[1, 6, 12, 18], num_classes=19,
        norm_layer=FrozenBatchNorm2d, hfr=hfr, reduced_channels=reduced)
    _randomize_bn1d(ref)
    ref.eval()
    rng = np.random.default_rng(4)
    out, low = _feats(rng)
    with torch.no_grad():
        want_logits, want_dec = ref({"out": torch.from_numpy(out),
                                     "low": torch.from_numpy(low)})

    head = SeparableASPPHead(num_classes=19, reduced_channels=reduced,
                             hfr=hfr, freeze_bn=True)
    feats = {"out": _to_nhwc(out), "low": _to_nhwc(low)}
    got_logits, got_dec = _port_and_apply(head, ref.state_dict(), feats,
                                          "deeplabv3plus", True)
    np.testing.assert_allclose(_nchw(got_dec), want_dec.numpy(),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(_nchw(got_logits), want_logits.numpy(),
                               rtol=2e-3, atol=1e-4)


def test_reference_golden_v3plus_hyper():
    """DepthwiseSeparableASPP_Hyper (reference :382-569) vs
    SeparableASPPHyperHead — the HALO flagship head: decoder + HFR +
    expmap + f64 Poincare MLR vs our f32 fused formulation."""
    from core.models.classifier import DepthwiseSeparableASPP_Hyper
    from core.models.layers import FrozenBatchNorm2d

    _ref_cfg(1.0)
    torch.manual_seed(0)
    ref = DepthwiseSeparableASPP_Hyper(
        inplanes=2048, dilation_series=[1, 6, 12, 18],
        padding_series=[1, 6, 12, 18], num_classes=19,
        norm_layer=FrozenBatchNorm2d, reduced_channels=16, hfr=True)
    _randomize_bn1d(ref)
    ref.eval()
    rng = np.random.default_rng(5)
    out, low = _feats(rng)
    with torch.no_grad():
        want_logits, want_embed = ref({"out": torch.from_numpy(out),
                                       "low": torch.from_numpy(low)})
    want_logits = want_logits.numpy()
    want_embed = want_embed.numpy()

    head = SeparableASPPHyperHead(num_classes=19, reduced_channels=16,
                                  hfr=True, freeze_bn=True)
    feats = {"out": _to_nhwc(out), "low": _to_nhwc(low)}
    got_logits, got_embed = _port_and_apply(head, ref.state_dict(), feats,
                                            "deeplabv3plus", True)
    np.testing.assert_allclose(_nchw(got_embed), want_embed,
                               rtol=5e-3, atol=5e-5)
    np.testing.assert_allclose(_nchw(got_logits), want_logits,
                               rtol=5e-3, atol=5e-3)
    agree = (np.argmax(_nchw(got_logits), 1)
             == np.argmax(want_logits, 1)).mean()
    assert agree > 0.999
    # radius parity: the acquisition signal itself
    from halo_tpu.ops import hyperbolic as hyp
    got_r = np.asarray(hyp.dist0(got_embed.astype(jnp.float32), axis=-1))
    want_r = 2 * np.arctanh(
        np.clip(np.linalg.norm(want_embed, axis=1), 0, 1 - 1e-15))
    np.testing.assert_allclose(got_r, np.transpose(want_r, (0, 1, 2)),
                               rtol=5e-3, atol=5e-4)
