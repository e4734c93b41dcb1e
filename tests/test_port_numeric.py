"""Numeric equivalence of ported torch weights: a torch op and the flax op
with converted weights must produce the same outputs (the layout half of
checkpoint parity; naming is covered in test_port_torch.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax import linen as nn  # noqa: E402


def _np(x):
    return x.detach().numpy()


@pytest.mark.parametrize("dilation,padding", [(1, 1), (6, 6)])
def test_conv_layout_equivalence(dilation, padding):
    rng = np.random.default_rng(0)
    w = torch.tensor(rng.normal(size=(8, 5, 3, 3)).astype(np.float32))
    b = torch.tensor(rng.normal(size=(8,)).astype(np.float32))
    x = torch.tensor(rng.normal(size=(2, 5, 16, 16)).astype(np.float32))
    want = _np(F.conv2d(x, w, b, padding=padding, dilation=dilation))

    conv = nn.Conv(8, (3, 3), padding=((padding, padding),) * 2,
                   kernel_dilation=(dilation, dilation), use_bias=True)
    variables = {"params": {"kernel": jnp.asarray(
        _np(w).transpose(2, 3, 1, 0)), "bias": jnp.asarray(_np(b))}}
    got = np.asarray(conv.apply(
        variables, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_depthwise_conv_layout_equivalence():
    rng = np.random.default_rng(1)
    C = 6
    w = torch.tensor(rng.normal(size=(C, 1, 3, 3)).astype(np.float32))
    x = torch.tensor(rng.normal(size=(1, C, 12, 12)).astype(np.float32))
    want = _np(F.conv2d(x, w, padding=1, groups=C))

    conv = nn.Conv(C, (3, 3), padding=((1, 1), (1, 1)),
                   feature_group_count=C, use_bias=False)
    variables = {"params": {"kernel": jnp.asarray(
        _np(w).transpose(2, 3, 1, 0))}}
    got = np.asarray(conv.apply(
        variables, jnp.asarray(_np(x).transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_linear_layout_equivalence():
    rng = np.random.default_rng(2)
    w = torch.tensor(rng.normal(size=(7, 4)).astype(np.float32))
    b = torch.tensor(rng.normal(size=(7,)).astype(np.float32))
    x = torch.tensor(rng.normal(size=(10, 4)).astype(np.float32))
    want = _np(F.linear(x, w, b))
    dense = nn.Dense(7)
    variables = {"params": {"kernel": jnp.asarray(_np(w).T),
                            "bias": jnp.asarray(_np(b))}}
    got = np.asarray(dense.apply(variables, jnp.asarray(_np(x))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_frozen_bn_equivalence():
    from halo_tpu.models.layers import FrozenBatchNorm
    rng = np.random.default_rng(3)
    C = 5
    weight = rng.normal(size=(C,)).astype(np.float32)
    bias = rng.normal(size=(C,)).astype(np.float32)
    mean = rng.normal(size=(C,)).astype(np.float32)
    var = np.abs(rng.normal(size=(C,))).astype(np.float32) + 0.1
    x = rng.normal(size=(2, 9, 9, C)).astype(np.float32)
    # torch FrozenBatchNorm2d semantics (reference: core/models/layers.py)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    scale = torch.tensor(weight) * (torch.tensor(var) + 1e-5).rsqrt()
    shift = torch.tensor(bias) - torch.tensor(mean) * scale
    want = _np(xt * scale.reshape(1, -1, 1, 1) + shift.reshape(1, -1, 1, 1))

    bn = FrozenBatchNorm(C)
    variables = {"frozen": {"weight": jnp.asarray(weight),
                            "bias": jnp.asarray(bias),
                            "running_mean": jnp.asarray(mean),
                            "running_var": jnp.asarray(var)}}
    got = np.asarray(bn.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-6)
