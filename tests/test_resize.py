"""resize ops: align-corners semantics vs torch + banded bit-exactness.

The bilinear resize is two banded MXU contractions (ops/resize.py); the
reference upsamples everywhere with torch
``F.interpolate(mode='bilinear', align_corners=True)``
(/root/reference/core/active/build.py:122-135, core/models/
classifier.py:556-557), so these goldens pin the exact operator the
parity chain depends on.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from halo_tpu.ops.resize import (_interp_matrix, resize_bilinear,
                                 resize_nearest)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((640, 1280), (1024, 2048)),   # sweep logits upsample
    ((80, 160), (1024, 2048)),     # sweep embed upsample (ratio 12.8)
    ((33, 65), (257, 129)),        # odd sizes, W downscale
    ((256, 512), (128, 256)),      # pure downscale
    ((5, 300), (640, 150)),        # H exact-hit rows sparse input
])
def test_banded_equals_dense(in_hw, out_hw):
    """The banded block contraction must reproduce the dense matmul to
    f32 ULP: every output pixel sums the same two real taps plus exact
    zeros, but a backend may group the pair into an FMA differently
    (observed max 2.4e-7 on CPU; measured bit-equal on the TPU)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=in_hw + (3,)), jnp.float32)
    got = resize_bilinear(x, out_hw)

    mh = jnp.asarray(_interp_matrix(out_hw[0], in_hw[0]), jnp.float32)
    mw = jnp.asarray(_interp_matrix(out_hw[1], in_hw[1]), jnp.float32)
    want = jnp.einsum("oh,hwc->owc", mh, x)
    want = jnp.einsum("pw,hwc->hpc", mw, want)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((40, 64), (160, 256)),
    ((64, 96), (31, 47)),
    ((1, 7), (9, 21)),             # degenerate single row
])
def test_bilinear_matches_torch_align_corners(in_hw, out_hw):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=in_hw + (4,)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    want = F.interpolate(
        torch.from_numpy(x).permute(2, 0, 1)[None], size=out_hw,
        mode="bilinear", align_corners=True,
    )[0].permute(1, 2, 0).numpy()
    # torch lerps (x0 + w*(x1-x0)) while the matmul computes
    # (1-w)*x0 + w*x1 — identical math, different rounding (~1e-5)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=5e-5)


def test_bilinear_batched_and_identity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 5)), jnp.float32)
    y = resize_bilinear(x, (32, 48))
    assert y.shape == (2, 32, 48, 5)
    assert resize_bilinear(x, (16, 24)) is x  # exact-size passthrough


def test_nearest_matches_cv2_mapping():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 255, (10, 14, 1)).astype(np.uint8)
    got = np.asarray(resize_nearest(jnp.asarray(x), (25, 7)))
    rows = np.minimum((np.arange(25) * 10 / 25).astype(int), 9)
    cols = np.minimum((np.arange(7) * 14 / 7).astype(int), 13)
    want = x[rows][:, cols]
    np.testing.assert_array_equal(got, want)
