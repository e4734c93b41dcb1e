"""int8 acquisition sweep: selection fidelity + on-chip round timing.

The acquisition round's cost is the sweep's eval forward (~15 of ~16
ms/img at 1024x2048, benchmarks/README.md round wall-clock note), and the
int8 W8A8 eval leg already measures 11.3 ms/img (BENCH_r04.json) — a
potential ~25% round-time win IF the coarser numerics don't move the
selected set. ``TPU.QUANT_SWEEP`` (engine/learners.py:_sweep_model_state)
routes the sweep forward through a PTQ-recalibrated int8 twin; this
harness measures both sides of the trade:

``--mode fidelity`` (CPU, the acquisition-quality protocol of
benchmarks/acquisition_quality.py — reference anchor
core/active/build.py:92-144, the per-image eval forward): source-pretrain
on the synthetic shift set, then run the halo arm twice — float sweep vs
QUANT_SWEEP — with identical seeds/budget and report

  * selected-set IoU between the two runs' gtIndicator artifacts
    (per-image intersection/union of the labeled-pixel sets),
  * budget-on-shifted / budget-on-rare for each (the mechanism metric),
  * endpoint present-class mIoU for each.

``--mode timing`` (real chip): the fused fwd+upsample+score+select sweep
program (region_selection.py's per-batch body, minus file IO) at the
flagship shapes — R101 v3+ hyper, 640x1280 input -> 1024x2048 native —
bf16-float vs int8 twin, ms/img for each.

Prints one JSON line per mode. Results recorded in benchmarks/README.md
and BASELINE.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def fidelity(seed=0, steps=48, pretrain_steps=400, budget=0.04):
    jax.config.update("jax_platforms", "cpu")
    import benchmarks.acquisition_quality as aq
    from halo_tpu.data import mask_cache
    from halo_tpu.data.masks import load_indicator
    from halo_tpu.engine import build_learner

    aq._DEVICE = "cpu"
    from tests.shift_dataset import build_shift_dataset

    out = {"metric": "int8_sweep_fidelity", "seed": seed, "budget": budget}
    with tempfile.TemporaryDirectory() as tmp:
        droot = build_shift_dataset(os.path.join(tmp, "data"), seed=seed)
        ckpt = aq.pretrain(droot, os.path.join(tmp, "out"), seed,
                           pretrain_steps)
        indicators = {}
        for variant, quant in (("float", False), ("int8", True)):
            mask_cache.clear()
            cfg = aq.arm_cfg(droot, os.path.join(tmp, "out"), "halo",
                             seed, steps, ckpt, budget)
            cfg.NAME = f"halo_{variant}_s{seed}"
            cfg.SAVE_DIR = os.path.join(tmp, "out", cfg.NAME)
            cfg.TPU.QUANT_SWEEP = quant
            learner = build_learner(cfg)
            learner.fit(val_interval=0)
            miou, per_class = aq.present_class_miou(learner)
            sfrac, rfrac = aq.budget_fractions(cfg.SAVE_DIR)
            out[f"{variant}_miou"] = round(miou, 2)
            out[f"{variant}_budget_on_shifted"] = round(sfrac, 4)
            out[f"{variant}_budget_on_rare"] = round(rfrac, 4)
            sel = {}
            ind_dir = os.path.join(cfg.SAVE_DIR, "gtIndicator")
            for root, _dirs, files in os.walk(ind_dir):
                for f in files:
                    p = os.path.join(root, f)
                    sel[os.path.relpath(p, ind_dir)] = (
                        load_indicator(p)["selected"].astype(bool))
            indicators[variant] = sel
            print(f"[{variant}] mIoU {miou:.2f} budget-on-shifted "
                  f"{sfrac:.1%} budget-on-rare {rfrac:.1%}", flush=True)

        assert indicators["float"].keys() == indicators["int8"].keys()
        inter = union = 0
        for k in indicators["float"]:
            a, b = indicators["float"][k], indicators["int8"][k]
            inter += int((a & b).sum())
            union += int((a | b).sum())
        out["selected_set_iou"] = round(inter / max(union, 1), 4)
        out["miou_delta"] = round(out["int8_miou"] - out["float_miou"], 2)
    print(json.dumps(out))
    return out


def _timing_program(cfg, model, variables, batch, native, quant):
    """One jitted fwd+fused-score+select program, region_selection.py's
    per-batch body without the host IO (same ops, same dtypes)."""
    import jax.numpy as jnp

    from halo_tpu.active.scoring import fused_upsample_region_score
    from halo_tpu.active.selection import (pallas_select_pixels_to_label,
                                           select_pixels_to_label)
    from halo_tpu.engine.steps import make_forward
    from halo_tpu.models import layers as model_layers

    forward = make_forward(model)
    select = (pallas_select_pixels_to_label
              if jax.default_backend() == "tpu"
              else select_pixels_to_label)
    # production round budget: ACTIVE.BUDGET 0.05 over 5 rounds
    # (reference defaults.py:70-76) -> ~2.3k picks at 1024x2048
    num_picks = int(np.ceil(native[0] * native[1] * 0.01 / 9))
    B = batch["img"].shape[0]

    prev = model_layers.QUANT_EVAL
    model_layers.QUANT_EVAL = quant

    def body(v, img, gt, mask, active, selected):
        out, aux = forward(v, img, False)
        rows = []
        for b in range(B):
            score, _, _ = fused_upsample_region_score(
                out[b], aux[b], native, None,
                score_dtype=jnp.bfloat16, unc_type="entropy",
                pur_type="radius", size=3, num_classes=19, K=100,
                normalize=True, c=1.0)
            res = select(score, mask[b].astype(jnp.int32),
                         gt[b].astype(jnp.int32), active[b], selected[b],
                         num_picks=num_picks, active_radius=1,
                         mask_radius=5)
            rows.append((res.active_mask.astype(jnp.uint8),
                         res.num_picked))
        return (jnp.stack([r[0] for r in rows]),
                jnp.stack([r[1] for r in rows]))

    try:
        t0 = time.time()
        prog = jax.jit(body).lower(
            variables, batch["img"], batch["gt"], batch["mask"],
            batch["active"], batch["selected"]).compile()
        compile_s = time.time() - t0
    finally:
        model_layers.QUANT_EVAL = prev
    return prog, compile_s


def timing(active_batch=2):
    import jax.numpy as jnp

    from halo_tpu.config import get_default_cfg
    from halo_tpu.models import build_segmentor
    from halo_tpu.models import layers as model_layers
    from halo_tpu.ops import quant as quant_ops

    assert jax.default_backend() != "cpu", (
        "timing mode measures the real chip; run without JAX_PLATFORMS=cpu")

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/gtav/source_target.yaml")
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"

    native = (1024, 2048)
    B = active_batch
    rng = np.random.default_rng(0)
    import ml_dtypes
    batch = {
        "img": jnp.asarray(rng.normal(size=(B, 640, 1280, 3))
                           .astype(ml_dtypes.bfloat16)),
        "gt": jnp.asarray(rng.integers(0, 19, (B,) + native), jnp.uint8),
        "mask": jnp.asarray(np.full((B,) + native, 255), jnp.uint8),
        "active": jnp.zeros((B,) + native, bool),
        "selected": jnp.zeros((B,) + native, bool),
    }

    rows = {}
    for variant in ("bf16", "int8"):
        quant = variant == "int8"
        qcfg = cfg.clone()
        qcfg.defrost()
        qcfg.TPU.QUANT_EVAL = quant
        model = build_segmentor(qcfg)
        variables = dict(model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            jnp.zeros((1, 64, 64, 3), jnp.float32), train=False))
        variables.pop("params_axes", None)
        if quant:
            # one calibration batch (random data: timing only needs
            # amax > 0 so the int8 path engages; fidelity is the CPU
            # mode's job)
            prev = model_layers.QUANT_EVAL
            model_layers.QUANT_EVAL = True
            try:
                _, mut = model.apply(
                    variables, batch["img"].astype(jnp.float32),
                    train=False, mutable=["quant"])
                variables["quant"] = mut["quant"]
                quant_ops.assert_calibrated(variables)
            finally:
                model_layers.QUANT_EVAL = prev

        prog, compile_s = _timing_program(
            qcfg, model, variables, batch, native, quant)
        masks, picked = prog(variables, batch["img"], batch["gt"],
                             batch["mask"], batch["active"],
                             batch["selected"])
        np.asarray(masks)  # warm + materialize once (relay acks early)

        # Delta-of-inner-count timing, synced on the few-byte `picked`
        # vector: a host materialization of the B full-res masks costs
        # ~hundreds of ms through this environment's relay, so timing
        # (queue-N, sync-once)/N without a delta inflates every image by
        # sync_cost/N — the round-5 first record shipped 31.6 ms/img
        # for a ~19 ms body that way (CLAUDE.md timing notes).
        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _i in range(n):
                    _masks, pk = prog(variables, batch["img"],
                                      batch["gt"], batch["mask"],
                                      batch["active"], batch["selected"])
                np.asarray(pk)
                best = min(best, time.perf_counter() - t0)
            return best
        n_small = max(1, int(np.ceil(10 / B)))
        n_big = 3 * n_small
        per_exec = (run(n_big) - run(n_small)) / (n_big - n_small)
        rows[variant] = {"ms_per_img": round(per_exec / B * 1e3, 2),
                         "compile_s": round(compile_s, 1),
                         "picked0": int(np.asarray(picked)[0])}
        print(json.dumps({variant: rows[variant]}), flush=True)

    out = {"metric": "int8_sweep_ms_per_img",
           "bf16": rows["bf16"]["ms_per_img"],
           "int8": rows["int8"]["ms_per_img"],
           "speedup": round(rows["bf16"]["ms_per_img"]
                            / rows["int8"]["ms_per_img"], 3),
           "active_batch": B}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=("fidelity", "timing"),
                    default="fidelity")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--pretrain-steps", type=int, default=400)
    ap.add_argument("--active-batch", type=int, default=2)
    ap.add_argument("--budget", type=float, default=0.04,
                    help="per-run pixel budget for fidelity mode "
                    "(0.01 = the scarce regime)")
    args = ap.parse_args()
    if args.mode == "fidelity":
        fidelity(args.seed, args.steps, args.pretrain_steps, args.budget)
    else:
        timing(args.active_batch)
