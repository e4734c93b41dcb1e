"""System-level active-learning proof (the paper's central claim).

Op-level goldens elsewhere pin that the scorer/selector/train step match
the reference; this test pins that the SYSTEM does active learning:
running the source_target protocol to completion on the synthetic
domain-shift set (tests/conftest.py:build_shift_dataset), HALO's
entropy x radius acquisition (reference:
core/active/floating_region.py:187-193) must beat seeded-random
selection at EQUAL budget, and any annotation must beat none, on final
present-class target mIoU.

The protocol is the reference's own workflow (SURVEY.md §3E): one
source-only pretrain per seed, then each arm adapts from that shared
checkpoint via cfg.resume — selection therefore scores a TRAINED model
(cold-start probes put halo's budget at the class base rate and failed
the ordering; see the harness docstring). Every input is seeded
(dataset, params, selection), so this is a deterministic regression pin
of the seed-0 arm recorded in BASELINE.md, not a statistical claim —
`python benchmarks/acquisition_quality.py --seeds 3` is the multi-seed
evidence. A selection-quality bug that preserves op parity
(mask/indicator bookkeeping skew across rounds, budget mis-accounting
between rounds) breaks the ordering here while passing every golden.

Runtime: a 60-step pretrain + 3 x a 48-step fit on one CPU
(slow-marked, like test_multihost_real); deselect with
`-k "not acquisition"` to iterate.
"""

import pytest


@pytest.mark.slow
def test_halo_beats_random_beats_none():
    from benchmarks.acquisition_quality import main

    out, _detail = main(seeds=1, steps=48, pretrain_steps=60,
                        verbose=False)
    halo, random_, none = out["halo"][0], out["random"][0], out["none"][0]
    # Equal-budget selection quality: the model-scored acquisition must
    # beat the blind one, and either must beat training with no target
    # annotation at all (the none arm only ever sees source labels).
    assert halo > random_ > none, (halo, random_, none)
    # The none arm is not degenerate (the protocol itself trains) and
    # the annotation lift is substantial, not a tie-break.
    assert none > 0.0, none
    assert halo >= none + 5.0, (halo, none)
