"""Dense 3x3 conv lowerings (layers.dense_stencil / space_to_batch_conv).

The reference's trunk convs are plain torch Conv2d (core/models/
resnet.py:83-95); on TPU we expose alternate lowerings behind
``TPU.DENSE_CONV_MODE`` ("conv" default — the alternatives lose or tie
in context, benchmarks/bench_dilated_conv.py). These tests pin that all
modes are value-identical and that the custom VJP matches autodiff of
the native conv, so flipping the knob can never change training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from halo_tpu.models import layers
from halo_tpu.models.layers import (dense_stencil, dense_stencil_eligible,
                                    space_to_batch_conv)


def _conv_ref(x, k, p, d):
    dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, k, (1, 1), ((p, p), (p, p)),
                                    rhs_dilation=(d, d),
                                    dimension_numbers=dn)


@pytest.mark.parametrize("cin,cout,d", [(8, 16, 1), (8, 16, 2), (5, 7, 4)])
def test_dense_stencil_matches_conv(cin, cout, d):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, cin)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
    ref = _conv_ref(x, k, d, d)
    got = dense_stencil(x, k, ((d, d), (d, d)), (d, d))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_dense_stencil_vjp_matches_autodiff(d):
    """The hand-written VJP (residuals (x, k) only) equals conv autodiff."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 12, 16, 6)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 5)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(1, 12, 16, 5)), jnp.float32)

    gx_r, gk_r = jax.grad(
        lambda x, k: jnp.sum(_conv_ref(x, k, d, d) * g), (0, 1))(x, k)
    gx_o, gk_o = jax.grad(
        lambda x, k: jnp.sum(
            dense_stencil(x, k, ((d, d), (d, d)), (d, d)) * g), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("d", [2, 4])
def test_space_to_batch_conv_matches_dilated(d):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 6)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 6, 5)), jnp.float32)
    ref = _conv_ref(x, k, d, d)
    got = space_to_batch_conv(x, lambda g: _conv_ref(g, k, 1, 1), d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_mode_equivalence_on_model(mini_cfg_factory=None):
    """All DENSE_CONV_MODE values produce the same flagship-arch logits
    from the same params (so the knob can never change results)."""
    from halo_tpu.config import get_default_cfg
    from halo_tpu.models import build_segmentor

    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnettiny"
    cfg.MODEL.HYPER = True
    cfg.MODEL.FREEZE_BN = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_segmentor(cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 64, 64, 3)),
                    jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "dropout": jax.random.PRNGKey(1)}, x, train=False)
    prev = layers.DENSE_CONV_MODE
    try:
        outs = {}
        for mode in ("conv", "shift9", "s2b"):
            layers.DENSE_CONV_MODE = mode
            out, _ = model.apply(v, x, size=(64, 64), train=False)
            outs[mode] = np.asarray(out)
    finally:
        layers.DENSE_CONV_MODE = prev
    for mode in ("shift9", "s2b"):
        np.testing.assert_allclose(outs[mode], outs["conv"],
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("d", [1, 2, 4])
def test_pallas_conv_matches_conv(d):
    """ops/pallas_conv kernel == native dilated conv (CPU interpreter)."""
    from halo_tpu.ops import pallas_conv

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 16, 32, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 128, 128)), jnp.float32) * 0.05
    assert pallas_conv.supports(x.shape, k.shape, d)
    prev = pallas_conv.INTERPRET
    pallas_conv.INTERPRET = True
    try:
        got = pallas_conv.dilated_conv3x3(x, k, d)
    finally:
        pallas_conv.INTERPRET = prev
    ref = _conv_ref(x, k, d, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pallas_conv_vjp_matches_autodiff():
    """The kernel's custom VJP (residuals (x, k) only) == conv autodiff."""
    from halo_tpu.ops import pallas_conv

    d = 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 128, 128)), jnp.float32) * 0.05
    g = jnp.asarray(rng.normal(size=(1, 8, 16, 128)), jnp.float32)
    prev = pallas_conv.INTERPRET
    pallas_conv.INTERPRET = True
    try:
        gx_o, gk_o = jax.grad(
            lambda x, k: jnp.sum(pallas_conv.dilated_conv3x3(x, k, d) * g),
            (0, 1))(x, k)
    finally:
        pallas_conv.INTERPRET = prev
    gx_r, gk_r = jax.grad(
        lambda x, k: jnp.sum(_conv_ref(x, k, d, d) * g), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-3)


def test_pallas_conv_eligibility():
    from halo_tpu.models.layers import pallas_conv_eligible
    from halo_tpu.ops import pallas_conv

    # shape-level support: lane alignment and VMEM fit
    assert pallas_conv.supports((1, 80, 160, 256), (3, 3, 256, 256), 2)
    assert not pallas_conv.supports((1, 80, 160, 256), (3, 3, 256, 256), 0)
    assert not pallas_conv.supports((1, 80, 160, 96), (3, 3, 96, 96), 2)
    # layer4 at d=4: the 15 MB padded input exceeds the VMEM budget
    assert not pallas_conv.supports((1, 80, 160, 512), (3, 3, 512, 512), 4)
    # module-level gate: default mode "conv" -> ineligible without opt-in
    assert layers.DENSE_CONV_MODE == "conv"
    assert not pallas_conv_eligible((1, 80, 160, 256), 256, (1, 1), (2, 2), 1)
    prev_mode, prev_int = layers.DENSE_CONV_MODE, pallas_conv.INTERPRET
    layers.DENSE_CONV_MODE, pallas_conv.INTERPRET = "pallas", True
    try:
        assert pallas_conv_eligible((1, 80, 160, 256), 256, (1, 1),
                                    (2, 2), 1)
        # strided / grouped / undilated convs stay on the native path
        assert not pallas_conv_eligible((1, 80, 160, 256), 256, (2, 2),
                                        (2, 2), 1)
        assert not pallas_conv_eligible((1, 80, 160, 256), 256, (1, 1),
                                        (2, 2), 2)
        assert not pallas_conv_eligible((1, 80, 160, 256), 256, (1, 1),
                                        (1, 1), 1)
    finally:
        layers.DENSE_CONV_MODE, pallas_conv.INTERPRET = prev_mode, prev_int


def test_eligibility_guards():
    # margin bound p <= d*(k-1): p=3, d=1, k=3 -> 3 > 2 ineligible
    assert not dense_stencil_eligible((3, 3), (1, 1), ((3, 3), (3, 3)),
                                      (1, 1), 1, mode="shift9")
    # strides / groups / string padding all disqualify
    assert not dense_stencil_eligible((3, 3), (2, 2), ((1, 1), (1, 1)),
                                      (1, 1), 1, mode="shift9")
    assert not dense_stencil_eligible((3, 3), (1, 1), ((1, 1), (1, 1)),
                                      (1, 1), 2, mode="shift9")
    assert not dense_stencil_eligible((3, 3), (1, 1), "SAME", (1, 1), 1,
                                      mode="shift9")
    assert dense_stencil_eligible((3, 3), (1, 1), ((2, 2), (2, 2)),
                                  (2, 2), 1, mode="shift9")
    # default module mode is "conv" -> ineligible without opt-in
    assert layers.DENSE_CONV_MODE == "conv"
    assert not dense_stencil_eligible((3, 3), (1, 1), ((1, 1), (1, 1)),
                                      (1, 1), 1)


def test_pallas_conv_vjp_cin_neq_cout_dx_fallback():
    """A supports()-eligible forward with cin != cout can have a dx whose
    TRANSPOSED kernel exceeds the VMEM budget (the resident input channel
    count changes); the VJP must fall back to the XLA emitter for dx
    rather than emit a zero row block. Grads must still match autodiff."""
    from halo_tpu.ops import pallas_conv

    d = 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 128, 256)), jnp.float32) * 0.05
    g = jnp.asarray(rng.normal(size=(1, 8, 16, 256)), jnp.float32)
    prev = pallas_conv.INTERPRET
    pallas_conv.INTERPRET = True
    try:
        assert pallas_conv.supports(x.shape, k.shape, d, 4)
        gx_o, gk_o = jax.grad(
            lambda x, k: jnp.sum(pallas_conv.dilated_conv3x3(x, k, d) * g),
            (0, 1))(x, k)
    finally:
        pallas_conv.INTERPRET = prev
    gx_r, gk_r = jax.grad(
        lambda x, k: jnp.sum(_conv_ref(x, k, d, d) * g), (0, 1))(x, k)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gk_o), np.asarray(gk_r),
                               rtol=1e-5, atol=1e-3)


def test_pallas_supports_itemsize_aware():
    """supports() sizes the VMEM working set by the compute itemsize: a
    shape that fits at bf16 (2 B) can exceed the budget at f32 (4 B)."""
    from halo_tpu.ops import pallas_conv

    shape, kshape = (1, 80, 160, 256), (3, 3, 256, 256)
    assert pallas_conv.supports(shape, kshape, 2, itemsize=2)   # ~10 MB
    assert not pallas_conv.supports(shape, kshape, 2, itemsize=4)  # ~19 MB
