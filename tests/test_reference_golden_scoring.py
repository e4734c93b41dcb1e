"""Acquisition-chain parity against the REAL reference code.

Imports the reference's own scorer and greedy selector
(core/active/floating_region.py:26-217, core/active/build.py:27-64) via
tests/reference_shims.py and asserts, on random logits/embeddings:

  * our floating_region_score reproduces the reference score / impurity /
    uncertainty maps at f32 tolerance across every
    {entropy, pixel_entropy, oracle_acc} x {ripu, oracle_ripu, hyper,
    radius, euc_norm} combination and both shipped radii;
  * on an identical score map, our greedy selector reproduces the
    reference's select_pixels_to_label outputs BIT-FOR-BIT (picks,
    active, selected, labeled mask), including the -inf pre-masking of
    already-active pixels and the early-stop break.

This closes the gap the head-activation goldens (test_reference_golden.py)
left: the scorer/selector used to be validated only against our own numpy
re-derivation (tests/test_active.py).
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from tests import reference_shims
from halo_tpu.active.scoring import floating_region_score
from halo_tpu.active.selection import (pallas_select_pixels_to_label,
                                       select_pixels_to_label)
from halo_tpu.ops import hyperbolic as hyp

reference_shims.install()


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    """The reference scorer hardcodes .cuda() in its zeros/ones branches
    (floating_region.py:87,183-198); run them on CPU unchanged."""
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)


def _make_inputs(seed=0, h=48, w=64, C=19, E=16):
    rng = np.random.default_rng(seed)
    logits = (rng.normal(size=(h, w, C)) * 2.5).astype(np.float32)
    u = (rng.normal(size=(h, w, E)) * 0.5).astype(np.float32)
    embed = np.asarray(hyp.expmap(jnp.asarray(u)))  # on-ball, f32
    gt = rng.integers(0, C, size=(h, w)).astype(np.int64)
    gt[:4, :6] = 255  # exercise the 255->prediction substitution
    return logits, embed, gt


def _reference_score(logits, embed, gt, *, unc, pur, size, normalize, C):
    """Run the real FloatingRegionScore on NCHW tensors.

    The embedding goes in as float64 — exactly what the reference head
    hands the scorer in production (DepthwiseSeparableASPP_Hyper returns
    double Poincare embeddings, classifier.py:553-554).
    """
    from core.active.floating_region import FloatingRegionScore

    frs = FloatingRegionScore(in_channels=C, size=size, purity_type=pur)
    lt = torch.from_numpy(np.transpose(logits, (2, 0, 1))[None])  # (1,C,h,w)
    et = torch.from_numpy(
        np.transpose(embed, (2, 0, 1))[None]).double()
    gtt = torch.from_numpy(gt)
    with torch.no_grad():
        score, imp, unc_map = frs(lt, decoder_out=et, unc_type=unc,
                                  pur_type=pur, normalize=normalize,
                                  ground_truth=gtt)
    return (score.numpy().astype(np.float64),
            imp.numpy().astype(np.float64),
            unc_map.numpy().astype(np.float64))


UNC_TYPES = ["entropy", "pixel_entropy", "oracle_acc"]
PUR_TYPES = ["ripu", "oracle_ripu", "hyper", "radius", "euc_norm"]


@pytest.mark.parametrize("size", [3, 5])  # RADIUS_K = 1 (shipped), 2
@pytest.mark.parametrize("pur", PUR_TYPES)
@pytest.mark.parametrize("unc", UNC_TYPES)
def test_score_maps_match_reference(unc, pur, size):
    C = 19
    logits, embed, gt = _make_inputs(seed=hash((unc, pur, size)) % 2**31)
    want_s, want_i, want_u = _reference_score(
        logits, embed, gt, unc=unc, pur=pur, size=size, normalize=True, C=C)
    got_s, got_i, got_u = floating_region_score(
        jnp.asarray(logits), jnp.asarray(embed.astype(np.float32)),
        jnp.asarray(gt.astype(np.int32)),
        unc_type=unc, pur_type=pur, size=size, num_classes=C, K=100,
        normalize=True)
    got = [np.asarray(x, np.float64) for x in (got_s, got_i, got_u)]

    if pur == "hyper":
        # f32-vs-f64 radius quantization can flip isolated pixels across
        # a bin boundary; the box-filtered impurity then differs in the
        # (2r+1)^2 windows touching them. Bound the blast radius instead
        # of the raw tolerance.
        for g, w in zip(got, (want_s, want_i, want_u)):
            bad = np.abs(g - w) > 1e-3
            assert bad.mean() < 0.02, f"{bad.mean():.4f} of pixels differ"
            np.testing.assert_allclose(g[~bad], w[~bad], rtol=3e-4,
                                       atol=3e-4)
    else:
        for g, w in zip(got, (want_s, want_i, want_u)):
            np.testing.assert_allclose(g, w, rtol=3e-4, atol=3e-4)


def test_dead_uncertainty_branches_match_reference():
    """'hyperbolic'/'certainty' fall into the reference's zeros branch
    (floating_region.py:84-91); we reproduce them as 'none'
    (scoring.py region_uncertainty). normalize=False because a zeros map
    min-max normalizes to NaN in both implementations."""
    C = 19
    logits, embed, gt = _make_inputs(seed=11)
    for ref_unc in ("hyperbolic", "certainty"):
        want_s, want_i, want_u = _reference_score(
            logits, embed, gt, unc=ref_unc, pur="radius", size=3,
            normalize=False, C=C)
        got_s, got_i, got_u = floating_region_score(
            jnp.asarray(logits), jnp.asarray(embed), jnp.asarray(
                gt.astype(np.int32)),
            unc_type="none", pur_type="radius", size=3, num_classes=C,
            normalize=False)
        np.testing.assert_allclose(np.asarray(got_u), want_u, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_i), want_i, rtol=3e-4,
                                   atol=3e-4)


def _reference_select(score, n, r, m, active, selected, active_mask, gt):
    from core.active.build import select_pixels_to_label as ref_select

    st = torch.from_numpy(score.copy())
    at = torch.from_numpy(active.copy())
    st[at] = -float("inf")  # reference masks before selecting (build.py:146)
    sel_t = torch.from_numpy(selected.copy())
    am_t = torch.from_numpy(active_mask.copy())
    gt_t = torch.from_numpy(gt)
    out = ref_select(st, n, r, m, at, sel_t, am_t, gt_t)
    return tuple(x.numpy() for x in out)  # score, active, selected, mask


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("r,m", [(1, 5), (1, 3), (2, 2)])
def test_greedy_selection_bitexact_vs_reference(seed, r, m):
    rng = np.random.default_rng(seed)
    H, W, n = 40, 56, 18
    score = rng.normal(size=(H, W)).astype(np.float32)
    gt = rng.integers(0, 19, size=(H, W)).astype(np.int64)
    active = np.zeros((H, W), bool)
    active[:7, :9] = True  # pre-active area must be skipped via -inf
    selected = np.zeros((H, W), bool)
    active_mask = np.full((H, W), 255, np.int64)

    ws, wa, wsel, wm = _reference_select(score, n, r, m, active, selected,
                                         active_mask, gt)
    res = select_pixels_to_label(
        jnp.asarray(score), jnp.asarray(active_mask.astype(np.int32)),
        jnp.asarray(gt.astype(np.int32)), jnp.asarray(active),
        jnp.asarray(selected), num_picks=n, active_radius=r, mask_radius=m)

    np.testing.assert_array_equal(np.asarray(res.active), wa)
    np.testing.assert_array_equal(np.asarray(res.selected), wsel)
    np.testing.assert_array_equal(np.asarray(res.active_mask), wm)
    np.testing.assert_array_equal(np.asarray(res.score), ws)

    got_p = pallas_select_pixels_to_label(
        jnp.asarray(score), jnp.asarray(active_mask.astype(np.int32)),
        jnp.asarray(gt.astype(np.int32)), jnp.asarray(active),
        jnp.asarray(selected), num_picks=n, active_radius=r, mask_radius=m,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(got_p.active_mask), wm)
    np.testing.assert_array_equal(np.asarray(got_p.selected), wsel)


def test_greedy_selection_early_stop_matches_reference():
    """Fewer finite pixels than budget: the reference breaks on -inf
    (build.py:40-41); picks and masks must agree bit-for-bit."""
    H = W = 24
    score = np.full((H, W), -np.inf, np.float32)
    score[3, 4] = 2.0
    score[20, 11] = 1.0
    gt = np.arange(H * W, dtype=np.int64).reshape(H, W) % 19
    zeros = np.zeros((H, W), bool)
    am = np.full((H, W), 255, np.int64)

    ws, wa, wsel, wm = _reference_select(score, 7, 1, 3, zeros, zeros, am,
                                         gt)
    res = select_pixels_to_label(
        jnp.asarray(score), jnp.asarray(am.astype(np.int32)),
        jnp.asarray(gt.astype(np.int32)), jnp.asarray(zeros),
        jnp.asarray(zeros), num_picks=7, active_radius=1, mask_radius=3)
    assert int(res.num_picked) == 2
    np.testing.assert_array_equal(np.asarray(res.active_mask), wm)
    np.testing.assert_array_equal(np.asarray(res.selected), wsel)
    np.testing.assert_array_equal(np.asarray(res.active), wa)
