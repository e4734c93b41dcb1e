"""Acquisition tests: box-filter/impurity/score goldens + greedy selection
equivalence against a literal (slow) numpy re-derivation of the reference
semantics (core/active/floating_region.py, core/active/build.py:27-64)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from halo_tpu.active.scoring import (box_filter, floating_region_score,
                                     normalize_map, region_impurity,
                                     quantize_radius_map)
from halo_tpu.active.selection import select_pixels_to_label
from halo_tpu.ops import hyperbolic as hyp


# ---------------------------------------------------------------------------
# numpy goldens
# ---------------------------------------------------------------------------

def np_box_filter(x, size):
    """Zero-padded all-ones conv over the two leading axes."""
    r = size // 2
    H, W = x.shape[:2]
    xp = np.zeros((H + 2 * r, W + 2 * r) + x.shape[2:], x.dtype)
    xp[r:r + H, r:r + W] = x
    out = np.zeros_like(x, dtype=np.float64)
    for dy in range(size):
        for dx in range(size):
            out += xp[dy:dy + H, dx:dx + W]
    return out


def np_softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def np_select(score, n, r, m, active, selected, active_mask, gt):
    """Literal torch-semantics greedy loop (reference build.py:27-64)."""
    score = score.copy()
    active = active.copy()
    selected = selected.copy()
    active_mask = active_mask.copy()
    for _ in range(n):
        values = score.max(axis=0)          # per-column max
        w = int(values.argmax())            # first max column
        if values[w] == -np.inf:
            break
        h = int(score[:, w].argmax())       # first max row in that column
        score[max(h - m, 0):h + m + 1, max(w - m, 0):w + m + 1] = -np.inf
        active[max(h - m, 0):h + m + 1, max(w - m, 0):w + m + 1] = True
        selected[max(h - r, 0):h + r + 1, max(w - r, 0):w + r + 1] = True
        active_mask[max(h - r, 0):h + r + 1, max(w - r, 0):w + r + 1] = \
            gt[max(h - r, 0):h + r + 1, max(w - r, 0):w + r + 1]
    return score, active, selected, active_mask


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size", [3, 5, 33])
def test_box_filter_matches_numpy(size):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(40, 56)).astype(np.float32)
    got = np.asarray(box_filter(jnp.asarray(x), size))
    np.testing.assert_allclose(got, np_box_filter(x, size), rtol=1e-5,
                               atol=1e-5)


def test_region_impurity_golden():
    rng = np.random.default_rng(1)
    predict = rng.integers(0, 19, size=(24, 32))
    imp, count = region_impurity(jnp.asarray(predict), 19, 3)
    onehot = np.eye(19)[predict]
    summary = np_box_filter(onehot, 3)
    cnt = summary.sum(-1)
    dist = summary / cnt[..., None]
    want = (-dist * np.log(dist + 1e-6)).sum(-1) / math.log(19)
    np.testing.assert_allclose(np.asarray(imp), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(count), cnt, rtol=1e-5)
    # interior windows see 9 pixels, corners 4
    assert np.asarray(count)[0, 0] == 4 and np.asarray(count)[5, 5] == 9


def test_entropy_ripu_score_golden():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(16, 20, 19)).astype(np.float32) * 2
    score, imp, unc = floating_region_score(
        jnp.asarray(logits), unc_type="entropy", pur_type="ripu",
        size=3, num_classes=19, normalize=False)
    p = np_softmax(logits.astype(np.float64))
    pe = (-p * np.log(p + 1e-6)).sum(-1) / math.log(19)
    went = np_box_filter(pe, 3)
    onehot = np.eye(19)[p.argmax(-1)]
    summary = np_box_filter(onehot, 3)
    cnt = summary.sum(-1)
    dist = summary / cnt[..., None]
    wimp = (-dist * np.log(dist + 1e-6)).sum(-1) / math.log(19)
    wunc = went / cnt
    np.testing.assert_allclose(np.asarray(unc), wunc, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(imp), wimp, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(score), wimp * wunc, rtol=1e-4,
                               atol=1e-5)


def test_radius_purity_uses_dist0_and_normalize():
    rng = np.random.default_rng(3)
    u = rng.normal(size=(8, 10, 16)).astype(np.float32) * 0.3
    embed = np.asarray(hyp.expmap(jnp.asarray(u)))
    logits = rng.normal(size=(8, 10, 19)).astype(np.float32)
    score, imp, unc = floating_region_score(
        jnp.asarray(logits), jnp.asarray(embed),
        unc_type="entropy", pur_type="radius", size=3, normalize=True)
    radius = np.asarray(hyp.dist0(jnp.asarray(embed)))
    rn = (radius - radius.min()) / (radius.max() - radius.min())
    np.testing.assert_allclose(np.asarray(imp), rn, rtol=1e-4, atol=1e-5)
    # normalized maps are in [0, 1]
    assert 0 <= float(np.asarray(unc).min()) and float(
        np.asarray(unc).max()) == pytest.approx(1.0, abs=1e-5)


def test_hyper_purity_quantization():
    rng = np.random.default_rng(4)
    u = rng.normal(size=(12, 12, 8)).astype(np.float32)
    embed = np.asarray(hyp.expmap(jnp.asarray(u)))
    q = np.asarray(quantize_radius_map(jnp.asarray(embed), K=100))
    assert q.min() >= 0 and q.max() <= 99
    # highest radius maps to bin 0 (inverted), lowest to ~K-1
    radius = np.asarray(hyp.dist0(jnp.asarray(embed)))
    assert q[np.unravel_index(radius.argmax(), q.shape)] == 0
    assert q[np.unravel_index(radius.argmin(), q.shape)] >= 98


def test_none_types_zero_score():
    logits = jnp.zeros((6, 6, 19))
    score, imp, unc = floating_region_score(
        logits, unc_type="none", pur_type="none", size=3, normalize=False)
    np.testing.assert_allclose(np.asarray(score), 0.0)


# ---------------------------------------------------------------------------
# greedy selection
# ---------------------------------------------------------------------------

def _run_both(H=32, W=48, n=20, r=1, m=5, seed=0, pre_active=False):
    rng = np.random.default_rng(seed)
    score = rng.normal(size=(H, W)).astype(np.float32)
    gt = rng.integers(0, 19, size=(H, W)).astype(np.int32)
    active = np.zeros((H, W), bool)
    selected = np.zeros((H, W), bool)
    if pre_active:
        active[:8, :8] = True
    active_mask = np.full((H, W), 255, np.int32)
    score_in = score.copy()
    score_in[active] = -np.inf
    ws, wa, wsel, wm = np_select(score_in, n, r, m, active, selected,
                                 active_mask, gt)
    res = select_pixels_to_label(
        jnp.asarray(score), jnp.asarray(active_mask), jnp.asarray(gt),
        jnp.asarray(active), jnp.asarray(selected),
        num_picks=n, active_radius=r, mask_radius=m)
    return (ws, wa, wsel, wm), res


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("r,m", [(1, 5), (1, 3), (2, 2)])
def test_selection_matches_reference_semantics(seed, r, m):
    (ws, wa, wsel, wm), res = _run_both(seed=seed, r=r, m=m)
    np.testing.assert_array_equal(np.asarray(res.active), wa)
    np.testing.assert_array_equal(np.asarray(res.selected), wsel)
    np.testing.assert_array_equal(np.asarray(res.active_mask), wm)
    np.testing.assert_array_equal(np.asarray(res.score), ws)


def test_selection_respects_preactive_and_budget():
    (ws, wa, wsel, wm), res = _run_both(pre_active=True, n=10)
    np.testing.assert_array_equal(np.asarray(res.active_mask), wm)
    # each pick labels a (2r+1)^2 region; overlaps possible but with m>r
    # suppression the selected area is exactly n*(2r+1)^2 here
    assert int(res.num_picked) == 10
    assert np.asarray(res.selected).sum() == wsel.sum()


def test_selection_exhausts_finite_scores():
    """When fewer finite pixels than budget, stops early like the
    reference's -inf break (build.py:40-41)."""
    H = W = 8
    score = np.full((H, W), -np.inf, np.float32)
    score[2, 3] = 1.0
    res = select_pixels_to_label(
        jnp.asarray(score), jnp.full((H, W), 255, jnp.int32),
        jnp.zeros((H, W), jnp.int32), jnp.zeros((H, W), bool),
        jnp.zeros((H, W), bool), num_picks=5, active_radius=1,
        mask_radius=2)
    assert int(res.num_picked) == 1
    assert np.asarray(res.selected).sum() == 9  # one 3x3 region


# ---------------------------------------------------------------------------
# Pallas selection kernel (interpret mode on CPU)
# ---------------------------------------------------------------------------

from halo_tpu.active.selection import pallas_select_pixels_to_label


@pytest.mark.parametrize("seed", [0, 3])
def test_pallas_selection_matches_xla_loop(seed):
    """The VMEM kernel must reproduce the XLA loop (and therefore the
    reference semantics) exactly, including tie-breaks and early stop."""
    rng = np.random.default_rng(seed)
    H, W, n, r, m = 32, 48, 15, 1, 3
    score = rng.normal(size=(H, W)).astype(np.float32)
    gt = rng.integers(0, 19, size=(H, W)).astype(np.int32)
    active = np.zeros((H, W), bool)
    active[:6, :6] = True
    selected = np.zeros((H, W), bool)
    am = np.full((H, W), 255, np.int32)

    ref = select_pixels_to_label(
        jnp.asarray(score), jnp.asarray(am), jnp.asarray(gt),
        jnp.asarray(active), jnp.asarray(selected),
        num_picks=n, active_radius=r, mask_radius=m)
    got = pallas_select_pixels_to_label(
        jnp.asarray(score), jnp.asarray(am), jnp.asarray(gt),
        jnp.asarray(active), jnp.asarray(selected),
        num_picks=n, active_radius=r, mask_radius=m, interpret=True)

    np.testing.assert_array_equal(np.asarray(got.picks),
                                  np.asarray(ref.picks))
    np.testing.assert_array_equal(np.asarray(got.active_mask),
                                  np.asarray(ref.active_mask))
    np.testing.assert_array_equal(np.asarray(got.selected),
                                  np.asarray(ref.selected))
    np.testing.assert_array_equal(np.asarray(got.active),
                                  np.asarray(ref.active))
    np.testing.assert_array_equal(np.asarray(got.score),
                                  np.asarray(ref.score))
    assert int(got.num_picked) == int(ref.num_picked)


def test_pallas_selection_early_stop():
    H = W = 16
    score = np.full((H, W), -np.inf, np.float32)
    score[4, 7] = 2.0
    score[12, 2] = 1.0
    got = pallas_select_pixels_to_label(
        jnp.asarray(score), jnp.full((H, W), 255, jnp.int32),
        jnp.zeros((H, W), jnp.int32), jnp.zeros((H, W), bool),
        jnp.zeros((H, W), bool), num_picks=6, active_radius=1,
        mask_radius=2, interpret=True)
    assert int(got.num_picked) == 2
    np.testing.assert_array_equal(np.asarray(got.picks)[:2],
                                  [[4, 7], [12, 2]])
    assert (np.asarray(got.picks)[2:] == -1).all()


def test_oracle_uncertainty_and_purity():
    """oracle_acc: box-filtered (1 - p_true); oracle_ripu: GT-based
    impurity with 255s replaced by the prediction (reference
    floating_region.py:77-83, 170-175)."""
    rng = np.random.default_rng(6)
    H, W, C = 12, 14, 5
    logits = rng.normal(size=(H, W, C)).astype(np.float32)
    gt = rng.integers(0, C, size=(H, W)).astype(np.int32)
    gt[0, :3] = 255
    p = np_softmax(logits.astype(np.float64))
    pred = p.argmax(-1)
    gtc = np.where(gt == 255, pred, gt)

    score, imp, unc = floating_region_score(
        jnp.asarray(logits), None, jnp.asarray(gt),
        unc_type="oracle_acc", pur_type="oracle_ripu", size=3,
        num_classes=C, normalize=False)

    p_true = np.take_along_axis(p, gtc[..., None], axis=-1)[..., 0]
    went = np_box_filter(1.0 - p_true, 3)
    onehot = np.eye(C)[gtc]
    summary = np_box_filter(onehot, 3)
    cnt = summary.sum(-1)
    dist = summary / cnt[..., None]
    wimp = (-dist * np.log(dist + 1e-6)).sum(-1) / math.log(C)
    np.testing.assert_allclose(np.asarray(unc), went / cnt, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(imp), wimp, rtol=1e-4, atol=1e-5)


def test_multi_round_accumulation():
    """Round 2 must not re-select round-1 regions: the -inf masking of the
    carried ``active`` indicator excludes them (reference build.py:146),
    and selected pixels accumulate."""
    rng = np.random.default_rng(7)
    H, W = 40, 60
    gt = rng.integers(0, 19, size=(H, W)).astype(np.int32)
    am = jnp.full((H, W), 255, jnp.int32)
    act = jnp.zeros((H, W), bool)
    sel = jnp.zeros((H, W), bool)

    s1 = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    r1 = select_pixels_to_label(s1, am, jnp.asarray(gt), act, sel,
                                num_picks=8, active_radius=1, mask_radius=3)
    s2 = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    r2 = select_pixels_to_label(s2, r1.active_mask, jnp.asarray(gt),
                                r1.active, r1.selected,
                                num_picks=8, active_radius=1, mask_radius=3)
    a1 = np.asarray(r1.active)
    picks2 = np.asarray(r2.picks)
    for hh, ww in picks2:
        assert not a1[hh, ww], "round-2 pick landed in round-1 active area"
    assert np.asarray(r2.selected).sum() > np.asarray(r1.selected).sum()
    # round-1 labels survive round 2
    m1 = np.asarray(r1.active_mask)
    m2 = np.asarray(r2.active_mask)
    keep = np.asarray(r1.selected)
    np.testing.assert_array_equal(m2[keep], m1[keep])


@pytest.mark.parametrize("unc,pur", [
    ("entropy", "radius"), ("entropy", "ripu"), ("pixel_entropy", "hyper"),
    ("oracle_acc", "oracle_ripu"), ("entropy", "euc_norm")])
def test_fused_upsample_scoring_bitequal(unc, pur):
    """fused_upsample_region_score (the production sweep's default,
    TPU.FUSED_UPSAMPLE) must reproduce the materializing
    resize->cast->score path: same interpolation contractions
    (row-sliced), same dtype casts, same _score_tail. Score maps agree
    to f32 ULP (the per-pixel map math runs on row blocks vs the full
    map, so reduction order can differ — observed max ~5e-7) and the
    GREEDY MASKS — the artifact that feeds training — are bit-equal."""
    import jax.numpy as jnp
    from halo_tpu.active.scoring import fused_upsample_region_score
    from halo_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(11)
    C, E = 19, 16
    native = (80, 128)
    lg_in = jnp.asarray(rng.normal(size=(40, 64, C)) * 2, jnp.bfloat16)
    em_in = jnp.asarray(rng.normal(size=(20, 32, E)) * 0.4, jnp.bfloat16)
    gt = jnp.asarray(rng.integers(0, C, native), jnp.int32)

    out = resize_bilinear(lg_in.astype(jnp.float32), native)
    out = out.astype(jnp.bfloat16)
    aux = resize_bilinear(em_in.astype(jnp.float32), native)
    aux = aux.astype(jnp.bfloat16)
    want_s, want_i, want_u = floating_region_score(
        out, aux, gt, unc_type=unc, pur_type=pur, size=3, num_classes=C,
        K=50, normalize=True)

    got_s, got_i, got_u = fused_upsample_region_score(
        lg_in, em_in, native, gt, score_dtype=jnp.bfloat16, block_rows=16,
        unc_type=unc, pur_type=pur, size=3, num_classes=C, K=50,
        normalize=True)

    for got, want in ((got_s, want_s), (got_i, want_i), (got_u, want_u)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-6)

    active_mask = jnp.full(native, 255, jnp.int32)
    zeros = jnp.zeros(native, bool)
    res_w = select_pixels_to_label(want_s, active_mask, gt, zeros, zeros,
                                   num_picks=25, active_radius=1,
                                   mask_radius=3)
    res_g = select_pixels_to_label(got_s, active_mask, gt, zeros, zeros,
                                   num_picks=25, active_radius=1,
                                   mask_radius=3)
    np.testing.assert_array_equal(np.asarray(res_g.active_mask),
                                  np.asarray(res_w.active_mask))
    np.testing.assert_array_equal(np.asarray(res_g.selected),
                                  np.asarray(res_w.selected))


def test_fused_upsample_ragged_blocks_prime_height():
    """block_rows need not divide the native height: the tail block is
    simply shorter. A prime native H (here 83) previously degenerated the
    exact-divisor search to blk=1 — H unrolled single-row blocks at trace
    time; now it runs [16,16,16,16,16,3] blocks and must still match the
    materializing path bit-for-bit on the greedy mask."""
    import jax.numpy as jnp
    from halo_tpu.active.scoring import (floating_region_score,
                                         fused_upsample_region_score)
    from halo_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(13)
    C, E = 19, 16
    native = (83, 128)  # prime H
    lg_in = jnp.asarray(rng.normal(size=(40, 64, C)) * 2, jnp.bfloat16)
    em_in = jnp.asarray(rng.normal(size=(20, 32, E)) * 0.4, jnp.bfloat16)

    out = resize_bilinear(lg_in.astype(jnp.float32), native)
    aux = resize_bilinear(em_in.astype(jnp.float32), native)
    want_s, _, _ = floating_region_score(
        out.astype(jnp.bfloat16), aux.astype(jnp.bfloat16), None,
        unc_type="entropy", pur_type="radius", size=3, num_classes=C,
        K=50, normalize=True)
    got_s, _, _ = fused_upsample_region_score(
        lg_in, em_in, native, None, score_dtype=jnp.bfloat16,
        block_rows=16, unc_type="entropy", pur_type="radius", size=3,
        num_classes=C, K=50, normalize=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=0, atol=2e-6)

    active_mask = jnp.full(native, 255, jnp.int32)
    zeros = jnp.zeros(native, bool)
    gt = jnp.asarray(rng.integers(0, C, native), jnp.int32)
    res_w = select_pixels_to_label(want_s, active_mask, gt, zeros, zeros,
                                   num_picks=25, active_radius=1,
                                   mask_radius=3)
    res_g = select_pixels_to_label(got_s, active_mask, gt, zeros, zeros,
                                   num_picks=25, active_radius=1,
                                   mask_radius=3)
    np.testing.assert_array_equal(np.asarray(res_g.active_mask),
                                  np.asarray(res_w.active_mask))


def test_fused_upsample_native_passthrough():
    """When the model output is already at native size (resize no-op),
    the fused path must still score identically."""
    import jax.numpy as jnp
    from halo_tpu.active.scoring import fused_upsample_region_score

    rng = np.random.default_rng(12)
    native = (32, 64)
    lg = jnp.asarray(rng.normal(size=(32, 64, 19)), jnp.bfloat16)
    em = jnp.asarray(rng.normal(size=(32, 64, 8)) * 0.4, jnp.bfloat16)
    want_s, _, _ = floating_region_score(
        lg, em, None, unc_type="entropy", pur_type="radius", size=3,
        normalize=True)
    got_s, _, _ = fused_upsample_region_score(
        lg, em, native, None, score_dtype=jnp.bfloat16, block_rows=8,
        unc_type="entropy", pur_type="radius", size=3, normalize=True)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=0, atol=2e-6)


def test_bf16_scoring_envelope_and_pick_agreement():
    """TPU.SCORING_DTYPE='bfloat16' feeds bf16 maps to the (f32-accumulating)
    score chain. The score map must stay inside a tight envelope of the f32
    chain and greedy selection must pick essentially the same regions —
    the validation behind the bf16 production default (defaults.py)."""
    import jax
    import jax.numpy as jnp
    from halo_tpu.active.selection import select_pixels_to_label

    rng = np.random.default_rng(0)
    H, W, C, E = 64, 96, 19, 16
    logits = rng.normal(size=(H, W, C)).astype(np.float32)
    embed = (rng.normal(size=(H, W, E)) * 0.4).astype(np.float32)

    outs = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        s, _, _ = floating_region_score(
            jnp.asarray(logits, dtype), jnp.asarray(embed, dtype),
            unc_type="entropy", pur_type="radius", size=3, num_classes=C,
            normalize=True)
        assert s.dtype == jnp.float32  # accumulation/output stay f32
        gt = jnp.asarray(rng.integers(0, C, (H, W)), jnp.int32)
        res = select_pixels_to_label(
            s, jnp.full((H, W), 255, jnp.int32), gt,
            jnp.zeros((H, W), bool), jnp.zeros((H, W), bool),
            num_picks=30, active_radius=1, mask_radius=3)
        outs[dtype.__name__] = (np.asarray(s), np.asarray(res.selected))

    s32, sel32 = outs["float32"]
    s16, sel16 = outs["bfloat16"]
    # normalized score in [0,1]: bf16 inputs stay within a small absolute
    # envelope (bf16 carries ~3 significant digits; the product of two
    # normalized maps lands around 5e-2 worst-case). Intermediate maps
    # stay f32 (scoring._map_dtype): 16-bit INTERMEDIATE storage was
    # tried and rejected — no measured speedup, and bf16 storage drove
    # this fixture to mean 8e-3 / pick-IoU 0.71.
    assert np.max(np.abs(s32 - s16)) < 8e-2
    assert np.mean(np.abs(s32 - s16)) < 2e-3
    inter = np.logical_and(sel32, sel16).sum()
    union = np.logical_or(sel32, sel16).sum()
    assert inter / union > 0.85  # picks move only between near-ties
