"""Model-stack tests: backbone pyramid shapes, head contracts, param parity.

Param-count assertions anchor on torchvision's published ResNet-101 size
(44,549,160 incl. the fc head → 42,500,160 for the trunk the reference taps,
core/models/feature_extractor.py:13-20), which pins every conv/BN shape
without needing torch at test time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.ops import hyperbolic as hyp


def _cfg(name="deeplabv3plus_resnet101", hyper=True, freeze_bn=True,
         hfr=True, reduced=64):
    cfg = get_default_cfg()
    cfg.defrost() if hasattr(cfg, "defrost") else None
    cfg.MODEL.NAME = name
    cfg.MODEL.HYPER = hyper
    cfg.MODEL.FREEZE_BN = freeze_bn
    cfg.MODEL.HFR = hfr
    cfg.MODEL.REDUCED_CHANNELS = reduced
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _init(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, train=train)


def param_count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def v3h_setup():
    cfg = _cfg()
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = _init(model, x)
    return cfg, model, x, variables


def test_backbone_pyramid_and_param_parity(v3h_setup):
    _, model, x, variables = v3h_setup
    out, embed = model.apply(variables, x, train=False)
    # OS=8 logits at feature res when size=None: 64/4=16 low-level res.
    assert out.shape == (1, 16, 16, 19)
    assert embed.shape == (1, 16, 16, 64)
    # torchvision resnet101 trunk parity: conv weights in `params`,
    # frozen BN affine+stats in `frozen` (affine only counts as params
    # in torch; stats are buffers there too).
    fe_params = variables["params"]["feature_extractor"]
    fe_frozen = variables["frozen"]["feature_extractor"]
    n_conv = param_count(fe_params)
    n_bn = sum(
        int(np.prod(p.shape))
        for path, p in jax.tree_util.tree_leaves_with_path(fe_frozen)
        if "running" not in jax.tree_util.keystr(path))
    assert n_conv + n_bn == 42_500_160, (n_conv, n_bn)


def test_hyper_embed_in_ball(v3h_setup):
    _, model, x, variables = v3h_setup
    key = jax.random.PRNGKey(2)
    xr = jax.random.normal(key, x.shape, jnp.float32)
    _, embed = model.apply(variables, xr, train=False)
    norms = np.linalg.norm(np.asarray(embed), axis=-1)
    assert norms.max() <= 1.0 - hyp.BALL_EPS + 1e-6


def test_logits_upsample_to_size(v3h_setup):
    _, model, x, variables = v3h_setup
    out, embed = model.apply(variables, x, size=(64, 64), train=False)
    assert out.shape == (1, 64, 64, 19)
    # v3+ hyper head keeps the embedding at feature resolution
    # (reference: classifier.py:556-558 upsamples logits only).
    assert embed.shape == (1, 16, 16, 64)


def test_train_mode_dropout_needs_rng(v3h_setup):
    _, model, x, variables = v3h_setup
    (out, _), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(3)})
    assert out.shape == (1, 16, 16, 19)


@pytest.mark.parametrize("name,hyper,aux_none", [
    ("deeplabv2_resnet101", False, True),
    ("deeplabv2_resnet101", True, False),
    ("deeplabv3plus_resnet101", False, False),
])
def test_all_head_variants(name, hyper, aux_none):
    cfg = _cfg(name=name, hyper=hyper, reduced=64 if hyper else 512,
               hfr=False)
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = _init(model, x)
    out, aux = model.apply(variables, x, size=(64, 64), train=False)
    assert out.shape == (1, 64, 64, 19)
    if aux_none:
        assert aux is None
    else:
        assert aux is not None


def test_live_bn_variant_has_batch_stats():
    cfg = _cfg(freeze_bn=False)
    model = build_segmentor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = _init(model, x, train=False)
    assert "batch_stats" in variables
    out, _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(0)})[0]
    assert out.shape[0] == 1


def test_dilated_stages_touch_wide_context():
    """Output stride is 8 and receptive field grows via dilation: a pixel
    far from an input impulse must still respond (dilation 2/4 in stages
    3/4 per torchvision bookkeeping)."""
    cfg = _cfg()
    from halo_tpu.models import build_feature_extractor
    bb = build_feature_extractor(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = bb.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    feats = bb.apply(variables, x, train=False)
    assert feats["low"].shape == (1, 16, 16, 256)
    assert feats["out"].shape == (1, 8, 8, 2048)


def test_depthwise_stencil_matches_grouped_conv(monkeypatch):
    """ConvBNReLU computes depthwise convs as a shifted multiply-add
    stencil (models/layers.py:_DepthwiseStencil, a measured v5e win over
    XLA's grouped-conv lowering). Same params, same math: outputs must
    agree with the grouped-conv path to f32 reassociation tolerance and
    the param tree must be layout-identical so checkpoints round-trip
    across both paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo_tpu.models import layers
    from halo_tpu.models.layers import ConvBNReLU

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 24, 32))
    ev = ConvBNReLU(32, (3, 3), (1, 1), ((2, 2), (2, 2)), (2, 2),
                    groups=32, freeze_bn=True, train=False)
    # grouped-conv reference: disable the train-mode stencil
    monkeypatch.setattr(layers, "STENCIL_TRAIN", False)
    tr = ConvBNReLU(32, (3, 3), (1, 1), ((2, 2), (2, 2)), (2, 2),
                    groups=32, freeze_bn=True, train=True)
    v_ev = ev.init(jax.random.PRNGKey(1), x)
    v_tr = tr.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v_ev)
            == jax.tree_util.tree_map(lambda a: a.shape, v_tr))
    out_ev = ev.apply(v_ev, x)
    out_tr = tr.apply(v_tr, x)  # same init key -> same params
    np.testing.assert_allclose(np.asarray(out_ev), np.asarray(out_tr),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad,dil", [(1, 1), (2, 2), (6, 6), (0, 3)])
def test_depthwise_stencil_custom_vjp_matches_grouped_grads(pad, dil):
    """The stencil's hand-written VJP (layers.py:depthwise_stencil — what
    makes the stencil usable in TRAINING without the per-tap residual
    blow-up) must produce the same dx and dkernel as autodiff through
    flax's grouped nn.Conv on identical params, across the head's
    dilation/padding configurations."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from halo_tpu.models.layers import depthwise_stencil

    C = 8
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 14, 18, C))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, C)) * 0.3
    cot_key = jax.random.PRNGKey(2)

    def f_stencil(x, k):
        y = depthwise_stencil(x, k, ((pad, pad), (pad, pad)), (dil, dil))
        return y, y.shape

    def f_conv(x, k):
        conv = nn.Conv(C, (3, 3), padding=((pad, pad), (pad, pad)),
                       kernel_dilation=(dil, dil), feature_group_count=C,
                       use_bias=False)
        y = conv.apply({"params": {"kernel": k[:, :, None, :]}}, x)
        return y, y.shape

    y_s, shape_s = f_stencil(x, k)
    y_c, shape_c = f_conv(x, k)
    assert shape_s == shape_c
    np.testing.assert_allclose(np.asarray(y_s), np.asarray(y_c),
                               rtol=1e-5, atol=1e-6)

    cot = jax.random.normal(cot_key, y_s.shape)
    _, vjp_s = jax.vjp(lambda a, b: f_stencil(a, b)[0], x, k)
    _, vjp_c = jax.vjp(lambda a, b: f_conv(a, b)[0], x, k)
    dx_s, dk_s = vjp_s(cot)
    dx_c, dk_c = vjp_c(cot)
    np.testing.assert_allclose(np.asarray(dx_s), np.asarray(dx_c),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dk_s),
                               np.asarray(dk_c).reshape(dk_s.shape),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pad,dil", [(1, 1), (2, 2), (4, 4), (0, 1)])
def test_gemm_wgrad_conv_matches_autodiff(pad, dil):
    """native_conv_gemm_wgrad (layers.py) keeps XLA's conv emitter for
    forward and input-grad but computes the weight grad as kh*kw shifted
    big-K GEMMs (XLA's own wgrad of the dilated trunk convs measures
    1.6x their forward on v5e, bench_bwd_parts.py). Forward must be
    bit-identical to the plain lax conv and both grads must match
    autodiff across the trunk's padding/dilation settings."""
    from flax import linen as nn

    from halo_tpu.models.layers import (gemm_wgrad_eligible,
                                        native_conv_gemm_wgrad)

    Cin, Cout = 6, 10
    assert gemm_wgrad_eligible((3, 3), (1, 1), ((pad, pad), (pad, pad)),
                               (dil, dil), 1)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 14, 18, Cin))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, Cin, Cout)) * 0.3

    def f_plain(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((pad, pad), (pad, pad)), rhs_dilation=(dil, dil),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def f_gemm(x, k):
        return native_conv_gemm_wgrad(x, k, ((pad, pad), (pad, pad)),
                                      (dil, dil))

    y_p = f_plain(x, k)
    y_g = f_gemm(x, k)
    np.testing.assert_array_equal(np.asarray(y_p), np.asarray(y_g))

    cot = jax.random.normal(jax.random.PRNGKey(2), y_p.shape)
    _, vjp_p = jax.vjp(f_plain, x, k)
    _, vjp_g = jax.vjp(f_gemm, x, k)
    dx_p, dk_p = vjp_p(cot)
    dx_g, dk_g = vjp_g(cot)
    np.testing.assert_allclose(np.asarray(dx_g), np.asarray(dx_p),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk_g), np.asarray(dk_p),
                               rtol=1e-5, atol=1e-4)


def test_gemm_wgrad_conv_module_param_layout():
    """GemmWgradConv's param tree is layout-identical to flax nn.Conv so
    checkpoints and torch imports round-trip across CONV_WGRAD modes, and
    its forward equals nn.Conv on the same params."""
    from flax import linen as nn

    from halo_tpu.models.layers import GemmWgradConv

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 12, 16, 5))
    g = GemmWgradConv(7, (3, 3), ((2, 2), (2, 2)), (2, 2))
    c = nn.Conv(7, (3, 3), padding=((2, 2), (2, 2)), kernel_dilation=(2, 2),
                use_bias=False)
    v_g = g.init(jax.random.PRNGKey(1), x)
    v_c = c.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_map(lambda a: a.shape, v_g)
            == jax.tree_util.tree_map(lambda a: a.shape, v_c))
    np.testing.assert_allclose(np.asarray(g.apply(v_g, x)),
                               np.asarray(c.apply(v_g, x)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", ["deeplabv3plus_resnettiny",
                                  "segformer_mittiny"])
def test_remat_is_a_pure_perf_knob(name):
    """TPU.REMAT (per-block rematerialization, models/build.py:44,51)
    trades recompute FLOPs for activation memory and must change NOTHING
    numerically: same init keys -> same params, and both forward outputs
    and parameter gradients match the non-remat model on both families."""
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3),
                          jnp.float32)

    def run(remat):
        cfg = _cfg(name, reduced=16)
        cfg.TPU.REMAT = remat
        model = build_segmentor(cfg)
        variables = dict(_init(model, x))
        params = variables.pop("params")

        def loss(p):
            out = model.apply({**variables, "params": p}, x, train=False)
            return sum(jnp.sum(l * l)
                       for l in jax.tree_util.tree_leaves(out))

        return jax.jit(jax.value_and_grad(loss))(params)

    l0, g0 = run(False)
    l1, g1 = run(True)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    # Tolerance is set by the GLOBAL gradient scale, not per-leaf:
    # remat changes XLA fusion, i.e. f32 summation order, and
    # cancellation-dominated leaves (attention biases sum thousands of
    # +-O(peak) terms down to ~1e-4) legitimately differ by a few ULPs
    # of the PARTIAL-SUM magnitude — a per-leaf rtol on such a leaf
    # compares reassociation noise to itself.
    gmax = max(float(jnp.max(jnp.abs(a))) for _, a in flat0)
    for (path, a), b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4,
            atol=1e-3 * gmax,
            err_msg=jax.tree_util.keystr(path))
