"""Engine integration tests: optimizer parity, train-step loss decrease,
active round end-to-end, checkpointing, and the 8-device SPMD path
(SURVEY.md §4 test plan items 3-4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import make_mini_cfg
from halo_tpu.engine import build_learner
from halo_tpu.engine.optim import torch_warmup_poly_schedule
from halo_tpu.engine.state import (load_module_params, restore_state,
                                   save_checkpoint)


def tiny_cfg(mini_root, tmp_path, protocol="source", devices=1):
    cfg = make_mini_cfg(mini_root, tmp_path)
    cfg.MODEL.NAME = "deeplabv3plus_resnettiny"
    cfg.MODEL.HYPER = True
    cfg.MODEL.HFR = True
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.MODEL.FREEZE_BN = True
    cfg.PROTOCOL = protocol
    cfg.SOLVER.BASE_LR = 0.005
    cfg.SOLVER.NUM_ITER = 6
    cfg.SOLVER.BATCH_SIZE = 2
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.ACTIVE.SELECT_ITER = [1]
    cfg.ACTIVE.BUDGET = 0.05
    cfg.ACTIVE.MASK_RADIUS_K = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DATA_PARALLEL = devices
    return cfg


def test_warmup_poly_schedule_matches_torch_formula():
    """LinearLR(0.01->1 over 600) then PolynomialLR(power) parity
    (reference: train_learners.py:184-203)."""
    base, W, total, power = 1e-3, 600, 60000, 0.5
    sched = torch_warmup_poly_schedule(base, W, total, power)
    # torch LinearLR at t<W: factor = 0.01 + 0.99*t/W
    for t in [0, 100, 599]:
        want = base * (0.01 + 0.99 * t / W)
        np.testing.assert_allclose(float(sched(t)), want, rtol=1e-6)
    P = total - W
    for t in [600, 10000, 59999]:
        want = base * (1 - (t - W) / P) ** power
        np.testing.assert_allclose(float(sched(t)), want, rtol=1e-5)


def test_source_learner_loss_decreases(mini_root, tmp_path):
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    learner = build_learner(cfg)
    hist = learner.fit(max_steps=6, val_interval=0)
    losses = [h["loss"] for h in hist]
    assert all(np.isfinite(losses))
    assert np.mean(losses[-2:]) < np.mean(losses[:2])
    assert os.path.exists(os.path.join(cfg.SAVE_DIR, "last.ckpt"))


def test_source_target_active_round(mini_root, tmp_path):
    cfg = tiny_cfg(mini_root, tmp_path, "source_target")
    learner = build_learner(cfg)
    hist = learner.fit(max_steps=3, val_interval=0)
    assert learner.active_round == 2  # one round ran (at step 1)
    # masks now contain GT labels in the selected regions
    from halo_tpu.data.masks import load_mask_png, load_indicator
    mask_dir = os.path.join(cfg.SAVE_DIR, "gtMask/train")
    found_labeled = 0
    for root, _dirs, files in os.walk(mask_dir):
        for f in files:
            m = load_mask_png(os.path.join(root, f))
            found_labeled += int((m != 255).sum())
    assert found_labeled > 0
    ind_dir = os.path.join(cfg.SAVE_DIR, "gtIndicator/train")
    inds = []
    for root, _dirs, files in os.walk(ind_dir):
        inds += [os.path.join(root, f) for f in files]
    assert inds
    ind = load_indicator(inds[0])
    assert ind["active"].shape == (32, 64)
    assert ind["active"].sum() >= ind["selected"].sum() > 0
    # budget: ceil(32*64*0.05/9) regions * 9 px, overlaps reduce it
    per_round = np.ceil(32 * 64 * 0.05 / 9) * 9
    assert ind["selected"].sum() <= per_round
    # losses include all four components
    assert {"loss", "loss_sup", "loss_sup_tgt",
            "negative_loss"} <= set(hist[0].keys()) - {"step"}


def test_quant_sweep_round(mini_root, tmp_path):
    """TPU.QUANT_SWEEP routes the acquisition sweep's eval forward
    through the int8 W8A8 twin (learners._ActiveMixin._sweep_model_state)
    while training itself stays float. Same protocol as the float round
    above: the round must run to completion, spend the same budget, and
    leave no quant residue on the training model. Fidelity of the
    SELECTION itself is measured on the pretrained shift set in
    benchmarks/bench_int8_sweep.py (an untrained tiny model's score
    ordering is noise, so mask-IoU assertions belong there)."""
    from halo_tpu.models import layers as model_layers

    def run(quant_sweep):
        cfg = tiny_cfg(mini_root, tmp_path, "source_target")
        cfg.NAME = f"qs_{int(quant_sweep)}"
        cfg.SAVE_DIR = os.path.join(cfg.OUTPUT_DIR, cfg.NAME)
        cfg.TPU.QUANT_SWEEP = quant_sweep
        from halo_tpu.data import mask_cache
        mask_cache.clear()
        learner = build_learner(cfg)
        learner.fit(max_steps=3, val_interval=0)
        assert learner.active_round == 2
        from halo_tpu.data.masks import load_indicator
        ind_dir = os.path.join(cfg.SAVE_DIR, "gtIndicator/train")
        selected = 0
        for root, _dirs, files in os.walk(ind_dir):
            for f in files:
                selected += int(load_indicator(
                    os.path.join(root, f))["selected"].sum())
        return learner, selected

    learner_q, selected_q = run(True)
    # int8 twin built + calibrated; the TRAINING state carries no quant
    # collection and the dispatch global is restored for later traces
    assert learner_q._quant_sweep is not None
    assert not learner_q.state.quant
    assert model_layers.QUANT_EVAL is False
    from halo_tpu.ops.quant import assert_calibrated
    qmodel, _, qzero = learner_q._quant_sweep
    with pytest.raises(ValueError):  # the zeros template is uncalibrated
        assert_calibrated({"quant": qzero})
    assert selected_q > 0

    # equal budget: num_picks is a budget CONSTANT, so the int8 sweep
    # spends what the float one does up to border clipping of region
    # boxes (pick positions may differ; a border pick's (2r+1)^2 box
    # clips smaller)
    _, selected_f = run(False)
    assert 0.7 * selected_f <= selected_q <= selected_f / 0.7


def test_checkpoint_roundtrip_and_module_load(mini_root, tmp_path):
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    learner = build_learner(cfg)
    p = str(tmp_path / "ck.ckpt")
    save_checkpoint(learner.state, p, extra={"mIoU": 1.0})
    st2 = restore_state(learner.state, p)
    a = jax.tree_util.tree_leaves(learner.state.params)[0]
    b = jax.tree_util.tree_leaves(st2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # per-module load into a fresh learner
    learner2 = build_learner(cfg)
    st3 = load_module_params(learner2.state, p, "classifier")
    ca = learner.state.params["classifier"]
    cb = st3.params["classifier"]
    la = jax.tree_util.tree_leaves(ca)
    lb = jax.tree_util.tree_leaves(cb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_eight_device_spmd(mini_root, tmp_path):
    """Full train step sharded over the fake 8-device CPU mesh — the DDP
    replacement path (SURVEY.md §2.2)."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg(mini_root, tmp_path, "source", devices=8)
    cfg.SOLVER.BATCH_SIZE = 1  # global batch 8
    learner = build_learner(cfg)
    assert learner.num_devices == 8
    hist = learner.fit(max_steps=2, val_interval=0)
    assert np.isfinite(hist[-1]["loss"])


def test_validation_and_test_learner(mini_root, tmp_path):
    cfg = tiny_cfg(mini_root, tmp_path, "test")
    from halo_tpu.engine import TestLearner
    learner = TestLearner(cfg)
    result = learner.test(max_batches=2)
    assert 0 <= result["mIoU"] <= 100
    assert len(result["iou_class"]) == 19


def test_test_learner_quant_eval(mini_root, tmp_path):
    """TPU.QUANT_EVAL through the serving surface: TestLearner auto-
    calibrates the PTQ state after the weight load (amax > 0 everywhere),
    the `quant` collection rides TrainState into the jitted eval step,
    and the quantized eval produces a sane IoU table. The reference has
    no quantized path — this is the TPU-native serving extension
    (ops/quant.py)."""
    cfg = tiny_cfg(mini_root, tmp_path, "test")
    cfg.TPU.QUANT_EVAL = True
    cfg.TPU.QUANT_CALIB_BATCHES = 1
    from halo_tpu.engine import TestLearner
    from halo_tpu.models import layers as layers_mod
    try:
        learner = TestLearner(cfg)
        assert learner.state.quant, "quantized build carries no PTQ state"
        for path, leaf in jax.tree_util.tree_leaves_with_path(
                learner.state.quant):
            if "amax" in jax.tree_util.keystr(path):
                assert float(leaf) > 0.0, path
        result = learner.test(max_batches=2)
        assert 0 <= result["mIoU"] <= 100
        assert np.isfinite(result["mIoU"])
    finally:
        layers_mod.QUANT_EVAL = False


def test_test_learner_quant_restore_skips_recalibration(mini_root, tmp_path):
    """PTQ serving hygiene (ADVICE r3 / VERDICT r3 #7): calibration draws
    from the TARGET TRAIN split (not the eval split being scored), a
    resume from a calibrated checkpoint KEEPS its scales (quant rides
    load_module_params), and TPU.QUANT_RECALIBRATE opts back into a fresh
    calibration."""
    import jax.tree_util as jtu
    from halo_tpu.engine import TestLearner
    from halo_tpu.models import layers as layers_mod

    def quant_cfg():
        cfg = tiny_cfg(mini_root, tmp_path, "test")
        cfg.TPU.QUANT_EVAL = True
        cfg.TPU.QUANT_CALIB_BATCHES = 1
        return cfg

    try:
        learner = TestLearner(quant_cfg())
        ds = learner._calib_loader().dataset
        assert ds.split == "train" and not getattr(ds, "active", False)

        # Perturb amax and checkpoint: the restore path must KEEP the
        # checkpoint's scales (skip recalibration), which a silent
        # recompute-from-data would overwrite.
        pert = jtu.tree_map_with_path(
            lambda p, l: l * 3.0 if "amax" in jtu.keystr(p) else l,
            learner.state.quant)
        ckpt = str(tmp_path / "calib.ckpt")
        save_checkpoint(learner.state.replace(quant=pert), ckpt)

        cfg2 = quant_cfg()
        cfg2.resume = ckpt
        learner2 = TestLearner(cfg2)
        for a, b in zip(jtu.tree_leaves(pert),
                        jtu.tree_leaves(learner2.state.quant)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        cfg3 = quant_cfg()
        cfg3.resume = ckpt
        cfg3.TPU.QUANT_RECALIBRATE = True
        learner3 = TestLearner(cfg3)
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for (p, a), b in zip(jtu.tree_leaves_with_path(pert),
                                 jtu.tree_leaves(learner3.state.quant))
            if "amax" in jtu.keystr(p))
        assert changed, "QUANT_RECALIBRATE did not refresh the scales"
    finally:
        layers_mod.QUANT_EVAL = False


def test_test_learner_save_embed_and_viz(mini_root, tmp_path):
    """TEST.SAVE_EMBED dumps embed/pred/output; VIZ_WRONG writes panels
    (reference: train_learners.py:598-623)."""
    cfg = tiny_cfg(mini_root, tmp_path, "test")
    cfg.TEST.SAVE_EMBED = True
    cfg.TEST.VIZ_WRONG = True
    from halo_tpu.engine import TestLearner
    learner = TestLearner(cfg)
    learner.test(max_batches=1)
    embed_dir = os.path.join(cfg.SAVE_DIR, "embed")
    files = os.listdir(embed_dir)
    assert files, "no embed dumps written"
    import torch
    blob = torch.load(os.path.join(embed_dir, files[0]), map_location="cpu",
                      weights_only=True)
    assert {"label", "pred", "output", "embed"} <= set(blob)
    assert blob["embed"].shape[-1] == 16  # reduced channels


def test_classifier_lr_is_10x(mini_root, tmp_path):
    """The two-group optimizer must apply lr (backbone) vs 10*lr (head)
    (reference: train_learners.py:174-177)."""
    import optax
    from halo_tpu.engine.optim import build_optimizer
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    tx, _ = build_optimizer(cfg, 1)
    params = {"feature_extractor": {"w": jnp.ones((3,))},
              "classifier": {"w": jnp.ones((3,))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    fea = float(updates["feature_extractor"]["w"][0])
    cls = float(updates["classifier"]["w"][0])
    np.testing.assert_allclose(cls / fea, 10.0, rtol=1e-5)
    np.testing.assert_allclose(fea, -cfg.SOLVER.BASE_LR, rtol=1e-5)


def test_optimizer_trajectory_matches_real_torch_stack(mini_root, tmp_path):
    """Multi-step trajectory golden against the REAL torch optimizer stack.

    Runs torch.optim.SGD (two groups, lr / lr*10) under
    SequentialLR(LinearLR(0.01, W), PolynomialLR(total-W, power)) — built
    exactly as the reference does (train_learners.py:167-208, including its
    `num_iters -= warmup_iters` before PolynomialLR) — for 8 steps spanning
    the warmup->poly boundary, feeding an identical fixed gradient sequence
    to our optax chain, and asserts every parameter matches after every
    step. Pins momentum accumulation (torch's first-step buf=grad), the
    wd-before-momentum ordering, and SequentialLR's milestone indexing
    (its restart-at-milestone quirk), none of which the single-step golden
    or the closed-form schedule test can catch."""
    import torch
    from torch.optim.lr_scheduler import (LinearLR, PolynomialLR,
                                          SequentialLR)
    from halo_tpu.engine.optim import build_optimizer

    BASE_LR, W, TOTAL, POWER, MOM, WD = 0.02, 3, 8, 0.5, 0.9, 5e-4
    rng = np.random.default_rng(0)
    fea0 = rng.normal(size=(4, 3)).astype(np.float32)
    cls0 = rng.normal(size=(5,)).astype(np.float32)
    grads_seq = [(rng.normal(size=(4, 3)).astype(np.float32),
                  rng.normal(size=(5,)).astype(np.float32))
                 for _ in range(TOTAL)]

    # ---- reference stack, verbatim construction ----------------------
    t_fea = torch.nn.Parameter(torch.from_numpy(fea0.copy()))
    t_cls = torch.nn.Parameter(torch.from_numpy(cls0.copy()))
    opt_fea = torch.optim.SGD([t_fea], lr=BASE_LR, momentum=MOM,
                              weight_decay=WD)
    opt_cls = torch.optim.SGD([t_cls], lr=BASE_LR * 10, momentum=MOM,
                              weight_decay=WD)
    num_iters = TOTAL - W
    scheds = []
    for opt in (opt_fea, opt_cls):
        lin = LinearLR(opt, start_factor=0.01, total_iters=W)
        poly = PolynomialLR(opt, num_iters, power=POWER)
        scheds.append(SequentialLR(opt, schedulers=[lin, poly],
                                   milestones=[W]))
    torch_traj = []
    for gf, gc in grads_seq:
        opt_fea.zero_grad(); opt_cls.zero_grad()
        t_fea.grad = torch.from_numpy(gf.copy())
        t_cls.grad = torch.from_numpy(gc.copy())
        opt_fea.step(); opt_cls.step()
        for s in scheds:
            s.step()
        torch_traj.append((t_fea.detach().numpy().copy(),
                           t_cls.detach().numpy().copy()))

    # ---- our optax chain ---------------------------------------------
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.WARMUP_ITERS = W
    cfg.SOLVER.NUM_ITER = TOTAL
    cfg.SOLVER.LR_POWER = POWER
    cfg.SOLVER.MOMENTUM = MOM
    cfg.SOLVER.WEIGHT_DECAY = WD
    tx, _ = build_optimizer(cfg, 1)
    params = {"feature_extractor": {"w": jnp.asarray(fea0)},
              "classifier": {"w": jnp.asarray(cls0)}}
    opt_state = tx.init(params)
    import optax
    for i, (gf, gc) in enumerate(grads_seq):
        grads = {"feature_extractor": {"w": jnp.asarray(gf)},
                 "classifier": {"w": jnp.asarray(gc)}}
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(
            np.asarray(params["feature_extractor"]["w"]), torch_traj[i][0],
            rtol=2e-6, atol=1e-7, err_msg=f"fea step {i}")
        np.testing.assert_allclose(
            np.asarray(params["classifier"]["w"]), torch_traj[i][1],
            rtol=2e-6, atol=1e-7, err_msg=f"cls step {i}")


def test_resume_full_continues_from_step(mini_root, tmp_path):
    """Crash-restart resume: full trainer state (params+optimizer+step)
    round-trips and fit() continues from the saved step."""
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    learner = build_learner(cfg)
    learner.fit(max_steps=3, val_interval=0)
    ckpt = os.path.join(cfg.SAVE_DIR, "last.ckpt")

    learner2 = build_learner(cfg)
    start = learner2.resume_full(ckpt)
    assert start == 3
    a = jax.tree_util.tree_leaves(learner.state.params)[0]
    b = jax.tree_util.tree_leaves(learner2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    hist = learner2.fit(max_steps=5, val_interval=0)
    assert [h["step"] for h in hist] == [3, 4]


def test_metrics_jsonl_schema_and_lr_trace(mini_root, tmp_path):
    """Observability parity (reference train_learners.py:210-217 logs
    losses, both group LRs and the active round every step): pins the
    metrics.jsonl step-record schema and checks the logged LR trace —
    including across a resume_full restart — matches the warmup->poly
    schedule exactly through the warmup boundary."""
    import json

    cfg = tiny_cfg(mini_root, tmp_path, "source")
    cfg.SOLVER.NUM_ITER = 8
    cfg.SOLVER.WARMUP_ITERS = 3
    learner = build_learner(cfg)
    learner.fit(max_steps=4, val_interval=0)
    learner2 = build_learner(cfg)
    assert learner2.resume_full(
        os.path.join(cfg.SAVE_DIR, "last.ckpt")) == 4
    learner2.fit(val_interval=0)

    with open(os.path.join(cfg.SAVE_DIR, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    steps = [r for r in records if "loss" in r]
    assert [r["step"] for r in steps] == list(range(8))
    for r in steps:
        assert {"step", "loss", "lr_fea", "lr_cls",
                "active_round"} <= set(r), sorted(r)
        assert r["active_round"] == 1

    # LR trace == schedule, across the warmup(3)->poly boundary and the
    # step-4 restart; classifier group at 10x throughout.
    sched = torch_warmup_poly_schedule(cfg.SOLVER.BASE_LR, 3, 8,
                                       cfg.SOLVER.LR_POWER)
    for r in steps:
        np.testing.assert_allclose(r["lr_fea"], float(sched(r["step"])),
                                   rtol=1e-6)
        np.testing.assert_allclose(r["lr_cls"], 10 * r["lr_fea"],
                                   rtol=1e-6)
    assert steps[2]["lr_fea"] < cfg.SOLVER.BASE_LR  # still warming up
    assert steps[3]["lr_fea"] == pytest.approx(cfg.SOLVER.BASE_LR)


def test_eval_step_flip_tta_golden(mini_root, tmp_path):
    """Flip-TTA must equal mean(softmax(f(x)), flip(softmax(f(flip(x)))))
    computed by two plain forwards (reference inference, :57-92)."""
    from halo_tpu.engine.steps import make_forward
    from halo_tpu.ops.resize import resize_bilinear
    cfg = tiny_cfg(mini_root, tmp_path, "test")
    from halo_tpu.engine import TestLearner
    learner = TestLearner(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 24, 48, 3)), jnp.float32)
    label = jnp.asarray(rng.integers(0, 19, (1, 32, 64)), jnp.int32)
    it, un, tg = learner.eval_step(learner.state, img, label, flip=True)

    fwd = make_forward(learner.model)
    variables = learner.state.variables()
    o1, _ = fwd(variables, img, False, size=None)
    o2, _ = fwd(variables, img[:, :, ::-1, :], False, size=None)
    p1 = jax.nn.softmax(resize_bilinear(
        o1.astype(jnp.float32), (32, 64)), axis=-1)
    p2 = jax.nn.softmax(resize_bilinear(
        o2.astype(jnp.float32), (32, 64)), axis=-1)
    pred = jnp.argmax((p1 + p2[:, :, ::-1, :]) / 2, axis=-1)
    from halo_tpu.utils.metrics import intersection_and_union
    wit, wun, wtg = intersection_and_union(pred, label, 19)
    np.testing.assert_array_equal(np.asarray(it), np.asarray(wit))
    np.testing.assert_array_equal(np.asarray(un), np.asarray(wun))


def test_fully_supervised_protocol(mini_root, tmp_path):
    """fully_sup trains on GT labels for both domains with no selection;
    cityscapes-as-source requires mask init (reference reaches initMask
    through SourceFreeLearner.__init__, train_learners.py:489-503)."""
    cfg = tiny_cfg(mini_root, tmp_path, "fully_sup")
    cfg.DATASETS.SOURCE_TRAIN = "cityscapes_train"
    learner = build_learner(cfg)
    hist = learner.fit(max_steps=2, val_interval=0)
    assert np.isfinite(hist[-1]["loss"])
    assert {"loss_sup", "loss_sup_tgt"} <= set(hist[0].keys())
    assert learner.active_round == 1  # no rounds ran


def test_active_batch_invariance(mini_root, tmp_path):
    """TPU.ACTIVE_BATCH must not change the acquisition masks: batched
    forwards produce per-image scores identical to the batch=1 sweep."""
    from halo_tpu.data.masks import load_mask_png

    masks = {}
    for ab in (1, 3):
        cfg = tiny_cfg(mini_root, tmp_path, "source_target")
        cfg.OUTPUT_DIR = str(tmp_path / f"out_ab{ab}")
        cfg.SAVE_DIR = str(tmp_path / f"out_ab{ab}" / "t")
        cfg.TPU.ACTIVE_BATCH = ab
        learner = build_learner(cfg)
        learner.fit(max_steps=2, val_interval=0)
        got = {}
        mask_dir = os.path.join(cfg.SAVE_DIR, "gtMask/train")
        for root, _dirs, files in os.walk(mask_dir):
            for f in files:
                got[f] = load_mask_png(os.path.join(root, f))
        masks[ab] = got
    assert masks[1].keys() == masks[3].keys()
    for k in masks[1]:
        np.testing.assert_array_equal(masks[1][k], masks[3][k])


def test_preemption_checkpoint(mini_root, tmp_path):
    """SIGTERM-equivalent preemption: the loop checkpoints and stops; a
    fresh learner resumes from the preempt checkpoint."""
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    learner = build_learner(cfg)

    orig = learner.on_batch_start

    def trip(step):
        if step == 2:
            # emulate the signal handler firing mid-training
            import halo_tpu.engine.learners as L
            os.kill(os.getpid(), __import__("signal").SIGTERM)
        return orig(step)

    learner.on_batch_start = trip
    learner.fit(max_steps=6, val_interval=0)
    p = os.path.join(cfg.SAVE_DIR, "preempt.ckpt")
    assert os.path.exists(p)
    learner2 = build_learner(cfg)
    assert learner2.resume_full(p) == 3  # step 2 completes, then ckpt


def test_grain_backend_trains(mini_root, tmp_path):
    """TPU.LOADER='grain' runs the training loop through the Grain input
    pipeline (multiprocess-capable) with identical semantics."""
    pytest.importorskip("grain.python")
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    cfg.TPU.LOADER = "grain"
    cfg.TPU.LOADER_WORKERS = 0  # in-process for CI speed
    learner = build_learner(cfg)
    hist = learner.fit(max_steps=2, val_interval=0)
    assert np.isfinite(hist[-1]["loss"])


def test_solver_gpus_sets_mesh_size(mini_root, tmp_path):
    """Reference configs list data-parallel devices in SOLVER.GPUS
    (train.py:124); with TPU.DATA_PARALLEL unset (-1) the mesh honors it."""
    cfg = tiny_cfg(mini_root, tmp_path, "source")
    cfg.TPU.DATA_PARALLEL = -1
    cfg.SOLVER.GPUS = [0, 1, 2, 3]
    cfg.SOLVER.BATCH_SIZE = 1
    learner = build_learner(cfg)
    assert learner.num_devices == 4
    assert learner.num_steps() == cfg.SOLVER.NUM_ITER // 4


def test_live_bn_sequential_momentum(mini_root, tmp_path):
    """With live BN (FREEZE_BN=False) a two-forward protocol must update
    running stats SEQUENTIALLY, like the reference where both forwards go
    through the same BN modules (train_learners.py:410-424): after the
    step, stats == d*(d*r0 + (1-d)*b_src) + (1-d)*b_tgt. We recompute the
    sequential result by chaining two mutable flax applies and compare to
    the train step's merged batch_stats."""
    cfg = tiny_cfg(mini_root, tmp_path, "source_target")
    cfg.MODEL.FREEZE_BN = False
    cfg.ACTIVE.SELECT_ITER = []
    learner = build_learner(cfg)
    assert learner.state.batch_stats  # live BN populated

    rng = jax.random.PRNGKey(7)
    src_img = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64, 3))
    tgt_img = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 64, 3))
    batches = {
        "source": {"img": src_img,
                   "label": jnp.zeros((2, 32, 64), jnp.int32)},
        "target": {"img": tgt_img,
                   "mask": jnp.full((2, 32, 64), 255, jnp.int32)},
    }
    state0 = learner.state

    # Reference-semantics recompute FIRST (train_step donates the state):
    # fwd(src) updates stats, fwd(tgt) continues from them (batch stats
    # are input-only, so this is exact).
    rngs = jax.random.split(rng, 2)
    params0, frozen0 = state0.params, state0.frozen
    stats0 = state0.batch_stats

    def seq_fwd(stats, x, key):
        variables = {"params": params0, "batch_stats": stats}
        if frozen0:
            variables["frozen"] = frozen0
        _, upd = learner.model.apply(
            variables, x, size=x.shape[1:3], train=True,
            mutable=["batch_stats"], rngs={"dropout": key})
        return upd["batch_stats"]

    stats1 = seq_fwd(stats0, src_img, rngs[0])
    stats2 = jax.tree_util.tree_map(
        np.asarray, seq_fwd(stats1, tgt_img, rngs[1]))

    new_state, _ = learner.train_step(state0, batches, rng)

    flat_got = jax.tree_util.tree_leaves(new_state.batch_stats)
    flat_want = jax.tree_util.tree_leaves(stats2)
    assert len(flat_got) == len(flat_want) > 0
    # Tolerance: the merged closed form d*a + b - d*old reassociates the
    # same f32 arithmetic (observed ~2e-5 abs); the pre-fix "second
    # forward wins" behavior differs at momentum scale (~1e-1), so this
    # still discriminates.
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-4)


def test_freeze_bn_scopes(mini_root, tmp_path):
    """MODEL.FREEZE_BN freezes the TRUNK's BN into the `frozen` collection
    (reference FrozenBatchNorm2d swap, core/models/build.py:26-39), but the
    HFR head's BatchNorm1d stays live even then (the reference never swaps
    it, classifier.py:530-550) — so the shipped recipes DO exercise the
    sequential-momentum merge and batch_stats must contain only HFR's bn."""
    cfg = tiny_cfg(mini_root, tmp_path, "source_target")
    learner = build_learner(cfg)
    assert learner.state.frozen  # trunk BN frozen
    stats_paths = ["/".join(str(k) for k in p) for p, _ in
                   jax.tree_util.tree_flatten_with_path(
                       learner.state.batch_stats)[0]]
    assert stats_paths  # HFR bn is live
    for p in stats_paths:
        assert "feature_extractor" not in p, p


def test_source_free_protocol(mini_root, tmp_path):
    """source_free: target-only CE on active masks + negative loss, with
    the active round hook (reference SourceFreeLearner :272-395). The
    loss stack must contain ONLY the target terms."""
    cfg = tiny_cfg(mini_root, tmp_path, "source_free")
    learner = build_learner(cfg)
    hist = learner.fit(max_steps=3, val_interval=0)
    assert learner.active_round == 2  # the round at step 1 ran
    keys = set(hist[0].keys()) - {"step"}
    assert "loss_sup_tgt" in keys and "negative_loss" in keys
    assert "loss_sup" not in keys  # no source CE in source_free
    assert all(np.isfinite(h["loss"]) for h in hist)
    # after the round, selected pixels make the masked CE non-zero
    assert hist[-1]["loss_sup_tgt"] > 0


def test_resume_full_restores_learner_counters(mini_root, tmp_path):
    """Preemption resume must restore active_round and best_miou: without
    them a resumed run renumbers rounds from 1 (overwriting round
    artifacts) and the first post-resume validation clobbers
    best_mIoU.ckpt (reference has no preemption machinery at all)."""
    cfg = tiny_cfg(mini_root, tmp_path, "source_target")
    learner = build_learner(cfg)
    learner.fit(max_steps=3, val_interval=0)
    assert learner.active_round == 2
    learner.best_miou = 41.5
    learner._save_checkpoint("preempt.ckpt")

    learner2 = build_learner(cfg)
    start = learner2.resume_full(
        os.path.join(cfg.SAVE_DIR, "preempt.ckpt"))
    assert start == 3
    assert learner2.active_round == 2
    assert learner2.best_miou == 41.5


def test_mixed_resolution_active_sweep(mini_root, tmp_path):
    """A mixed-resolution target set at ACTIVE_BATCH>1: group_by_size
    buckets the sweep into single-size batches and the masks are
    bit-identical to the batch=1 sweep (which traces one program per
    image size either way)."""
    from tests.conftest import add_mixed_size_images
    from halo_tpu.active.region_selection import region_selection
    from halo_tpu.data import mask_cache
    from halo_tpu.data.masks import load_mask_png

    add_mixed_size_images(mini_root)  # 3 imgs @32x64 + 2 @40x72
    masks = {}
    for ab in (1, 2):
        mask_cache.clear()
        cfg = tiny_cfg(mini_root, tmp_path, "source_target")
        cfg.OUTPUT_DIR = str(tmp_path / f"out_mix{ab}")
        cfg.SAVE_DIR = str(tmp_path / f"out_mix{ab}" / "t")
        cfg.TPU.ACTIVE_BATCH = ab
        learner = build_learner(cfg)
        stats = region_selection(cfg, learner.model, learner.state,
                                 learner.active_loader, 1,
                                 mesh=learner.mesh)
        assert stats["images"] == 5  # pads discarded
        got = {}
        mask_dir = os.path.join(cfg.SAVE_DIR, "gtMask/train")
        for root, _dirs, files in os.walk(mask_dir):
            for f in files:
                got[f] = load_mask_png(os.path.join(root, f))
        masks[ab] = got
    assert masks[1].keys() == masks[2].keys() and len(masks[1]) == 5
    for k in masks[1]:
        np.testing.assert_array_equal(masks[1][k], masks[2][k])


def test_random_acquisition_arm(mini_root, tmp_path):
    """ACTIVE.UNCERTAINTY='random' (extension — the reference has no
    random baseline in code): per-image seeded uniform score through the
    SAME greedy selector at the SAME budget; the equal-budget control arm
    for acquisition-quality A/Bs (benchmarks/acquisition_quality.py).
    Deterministic in (SEED, round, global image index); distinct from the
    model-scored masks."""
    from halo_tpu.active.region_selection import region_selection
    from halo_tpu.data import mask_cache
    from halo_tpu.data.masks import load_mask_png

    def run(mode, out):
        mask_cache.clear()
        cfg = tiny_cfg(mini_root, tmp_path, "source_target")
        cfg.OUTPUT_DIR = str(tmp_path / out)
        cfg.SAVE_DIR = str(tmp_path / out / "t")
        if mode == "random":
            cfg.ACTIVE.UNCERTAINTY = "random"
        learner = build_learner(cfg)
        stats = region_selection(cfg, learner.model, learner.state,
                                 learner.active_loader, 1,
                                 mesh=learner.mesh)
        masks = {}
        mask_dir = os.path.join(cfg.SAVE_DIR, "gtMask/train")
        for root, _dirs, files in os.walk(mask_dir):
            for f in files:
                masks[f] = load_mask_png(os.path.join(root, f))
        return stats, masks

    s1, m1 = run("random", "rand1")
    s2, m2 = run("random", "rand2")
    s3, m3 = run("halo", "halo")
    assert s1["picked"] == s3["picked"] > 0        # equal budget
    assert m1.keys() == m2.keys() == m3.keys()
    for k in m1:                                   # deterministic
        np.testing.assert_array_equal(m1[k], m2[k])
    assert any(not np.array_equal(m1[k], m3[k]) for k in m1)


def test_mixed_resolution_fit(mini_root, tmp_path):
    """End-to-end fit on a mixed-resolution target set: the train loader
    rides native-res origin_* fields as ragged host lists (collate
    fallback) and the active round buckets by size — both were crashes
    before group_by_size landed."""
    from tests.conftest import add_mixed_size_images

    add_mixed_size_images(mini_root)
    cfg = tiny_cfg(mini_root, tmp_path, "source_target")
    cfg.TPU.ACTIVE_BATCH = 2
    learner = build_learner(cfg)
    hist = learner.fit(max_steps=2, val_interval=0)
    assert np.isfinite(hist[-1]["loss"])
    mask_dir = os.path.join(cfg.SAVE_DIR, "gtMask/train")
    n = sum(len(fs) for _r, _d, fs in os.walk(mask_dir))
    assert n == 5  # every image masked, both resolutions


def test_conv_wgrad_modes_train_identically(mini_root, tmp_path):
    """TPU.CONV_WGRAD=gemm (custom GEMM weight-grad VJP for the dense
    stride-1 trunk convs, models/layers.py) must be a pure lowering
    choice: forwards are bit-identical (same emitter HLO) and the
    training trajectory matches the XLA-autodiff path to float
    reassociation tolerance. Sequential builds because the mode is a
    module-level lowering switch read at trace time."""
    results = {}
    for mode in ("conv", "gemm"):
        cfg = tiny_cfg(mini_root, tmp_path / mode, "source")
        cfg.TPU.CONV_WGRAD = mode
        learner = build_learner(cfg)
        hist = learner.fit(max_steps=3, val_interval=0)
        results[mode] = ([h["loss"] for h in hist], learner.state.params)
    np.testing.assert_allclose(results["gemm"][0], results["conv"][0],
                               rtol=1e-6, atol=1e-7)
    flat_g = jax.tree_util.tree_leaves(results["gemm"][1])
    flat_c = jax.tree_util.tree_leaves(results["conv"][1])
    for a, b in zip(flat_g, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
