"""Does the hyperbolic radius track class rarity? (the paper's core claim)

HALO's acquisition multiplies windowed entropy by the per-pixel
hyperbolic radius (reference: core/active/floating_region.py:187-193);
the paper's justification is that rare/hard classes embed at larger
Poincare radius, so the radius factor routes annotation budget toward
them. This harness measures that claim directly on the synthetic
domain-shift set with a source-pretrained model (the state the real
acquisition scores, benchmarks/acquisition_quality.py):

  * per-class mean radius over the target-train images,
  * each class's pixel share vs its share of the TOP-4% score mass
    (where the greedy selector's budget actually lands).

Measured 2026-08-19 (seed 0, 400-step pretrain, the shipped multi-hue
sigma=28 set): the rare classes carry the largest radii and the score
concentrates their budget far above pixel share — recorded in
benchmarks/README.md. Usage:

  python benchmarks/radius_rarity.py [--workdir DIR]

--workdir caches the dataset + pretrain checkpoint between runs
(default: a temp dir, built fresh).
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

CLS = {0: "road", 2: "building", 5: "pole", 8: "vegetation", 10: "sky",
       13: "car*", 15: "bus*"}  # * = colors shift in the target domain


def measure(workdir, seed=0, pretrain_steps=400, top_frac=0.04):
    from benchmarks.acquisition_quality import arm_cfg, pretrain
    from tests.shift_dataset import build_shift_dataset

    droot = os.path.join(workdir, "data")
    if not os.path.exists(os.path.join(droot, "gtav")):
        build_shift_dataset(droot, seed=seed)
    ckpt = pretrain(droot, os.path.join(workdir, "out"), seed,
                    pretrain_steps)

    from halo_tpu.active.scoring import _radius_map, floating_region_score
    from halo_tpu.data.build import build_dataset
    from halo_tpu.engine import build_learner
    from halo_tpu.ops.resize import resize_bilinear

    cfg = arm_cfg(droot, os.path.join(workdir, "out"), "halo", seed, 48,
                  ckpt)
    learner = build_learner(cfg)
    variables = learner.state.variables()
    model = learner.model
    h, w = cfg.INPUT.TARGET_INPUT_SIZE_TRAIN[1], \
        cfg.INPUT.TARGET_INPUT_SIZE_TRAIN[0]

    def _fwd(v, x):
        out, aux = model.apply(v, x, train=False)
        return (resize_bilinear(out.astype(jnp.float32), (h, w)),
                resize_bilinear(aux.astype(jnp.float32), (h, w)))

    fwd = jax.jit(_fwd)

    ds = build_dataset(cfg, mode="active", is_source=False)
    rad_sum = np.zeros(19)
    rad_cnt = np.zeros(19)
    top_cnt = np.zeros(19)
    top_tot = 0
    for i in range(len(ds)):
        it = ds[i]
        img = np.asarray(it["img"], np.float32)[None]
        lab = np.asarray(it["origin_label"])
        logits, embed = fwd(variables, jnp.asarray(img))
        rad = np.asarray(_radius_map(embed[0], 1.0, False), np.float64)
        score, _, _ = floating_region_score(logits[0], embed[0], size=3,
                                            normalize=True)
        score = np.asarray(score, np.float64)
        k = int(score.size * top_frac)
        top = np.argpartition(score.ravel(), -k)[-k:]
        labf = lab.ravel()[top]
        for c in CLS:
            m = lab == c
            rad_sum[c] += rad[m].sum()
            rad_cnt[c] += m.sum()
            top_cnt[c] += int((labf == c).sum())
        top_tot += k

    tot = rad_cnt.sum()
    rows = {}
    for c, name in CLS.items():
        rows[name] = {
            "mean_radius": round(float(rad_sum[c] / rad_cnt[c]), 4),
            "px_share": round(float(rad_cnt[c] / tot), 4),
            "score_top_share": round(float(top_cnt[c] / top_tot), 4),
        }
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pretrain-steps", type=int, default=400)
    args = ap.parse_args()
    if args.workdir:
        os.makedirs(args.workdir, exist_ok=True)
        rows = measure(args.workdir, args.seed, args.pretrain_steps)
    else:
        with tempfile.TemporaryDirectory() as tmp:
            rows = measure(tmp, args.seed, args.pretrain_steps)
    print(f"{'class':12s} {'mean-radius':>11s} {'px-share':>9s} "
          f"{'top-4%-share':>13s}")
    for name, r in rows.items():
        print(f"{name:12s} {r['mean_radius']:11.4f} {r['px_share']:9.1%} "
              f"{r['score_top_share']:13.1%}")
    print(json.dumps({"metric": "radius_rarity", **rows}))


if __name__ == "__main__":
    main()
