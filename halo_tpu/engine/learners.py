"""Training protocols (learners) — the runtime over the step library.

Replaces the reference's Lightning stack (reference:
core/train_learners.py:28-715): one ``Learner`` owns the model, the mesh,
the compiled train/eval steps, the loaders, checkpointing, validation
cadence and active-round scheduling. Protocols differ only in their loss
stack (engine/steps.py) and loaders, mirroring the reference's subclassing:

  source        -> SourceLearner        (:220-269)
  source_free   -> SourceFreeLearner    (:272-395)
  source_target -> SourceTargetLearner  (:398-486)
  fully_sup     -> FullySupervisedLearner (:489-586)
  test          -> Test                 (:589-715)

DDP-semantic parity: with n devices on the data mesh axis the per-run step
count is NUM_ITER // n (reference scales per-rank iterations the same way,
:181) and SELECT_ITER scale by the same factor (:299-302). Validation runs
every 500 steps with best-mIoU checkpointing (train.py:109-115,135).
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DataLoader, DatasetCatalog, build_dataset
from ..models import build_segmentor
from ..parallel import multihost
from ..parallel.mesh import batch_sharding, create_mesh, replicate_tree
from ..utils.metrics import miou_from_histograms, miou_star
from .optim import build_optimizer
from .state import (load_module_params, restore_state, save_checkpoint,
                    state_from_variables)
from .steps import make_eval_step, make_train_step

NUM_WORKERS = 4
# Multi-host preemption-flag agreement cadence (steps between the 1-byte
# DCN allgathers in fit(); see the poll comment there).
_PREEMPT_POLL_STEPS = 10


class Learner:
    """Shared runtime (reference BaseLearner, train_learners.py:28-217)."""

    protocol: str = "source"

    def __init__(self, cfg):
        self.cfg = cfg
        self.debug = bool(cfg.DEBUG)
        self.model = build_segmentor(cfg)
        dp = int(getattr(cfg.TPU, "DATA_PARALLEL", -1))
        if dp == -1 and cfg.SOLVER.GPUS and multihost.process_count() == 1:
            # Drop-in reference semantics: SOLVER.GPUS lists the data-
            # parallel devices (train.py:124); cap by what exists. Set
            # TPU.DATA_PARALLEL explicitly to override. Single-host only:
            # in a multi-host run a truncated device list would build a
            # mesh excluding other hosts' chips while every process still
            # contributes a loader shard — make_array_from_process_local_
            # data then fails; pods use the full device set.
            dp = min(len(cfg.SOLVER.GPUS), len(jax.devices()))
        self.mesh = create_mesh(
            data_parallel=dp,
            spatial_parallel=int(getattr(cfg.TPU, "SPATIAL_PARALLEL", 1)))
        self.num_devices = self.mesh.shape["data"]
        self.tx, self.schedules = build_optimizer(cfg, self.num_devices)

        seed = cfg.SEED if cfg.SEED >= 0 else int(time.time()) % (2 ** 31)
        # All hosts must agree on the seed: the loader shards assume every
        # process shuffles the SAME global order, and the fallback above
        # is wall-clock-derived (reference seeds the same way pre-spawn,
        # train.py:97-100; DDP inherits rank-0's seed by fork).
        seed = multihost.broadcast_seed(seed)
        self.seed = seed
        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng, drop_rng = jax.random.split(rng, 3)

        # Initialize on a small dummy batch (shapes don't bind params).
        w, h = cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = self.model.init(
            {"params": init_rng, "dropout": drop_rng}, dummy, train=False)
        self.state = state_from_variables(variables, self.tx)

        # ImageNet trunk auto-load (reference: core/models/resnet.py:209-212
        # loads MODEL.WEIGHTS at build); cfg.resume then overrides.
        if cfg.MODEL.WEIGHTS:
            from ..models.port_torch import load_pretrained_backbone
            self.state = load_pretrained_backbone(self.state,
                                                  cfg.MODEL.WEIGHTS)
        if cfg.resume:
            self.state = load_module_params(self.state, cfg.resume,
                                            "feature_extractor")
            self.state = load_module_params(self.state, cfg.resume,
                                            "classifier")
        self.state = replicate_tree(self.state, self.mesh)

        # donate the state: params/momentum update in place (halves the
        # peak param-memory traffic of the SGD step)
        self.train_step = jax.jit(
            make_train_step(cfg, self.model, self.tx, self.protocol),
            donate_argnums=(0,))
        self.eval_step = make_eval_step(cfg, self.model)
        self.history: List[Dict] = []
        self.best_miou = -1.0
        self.active_round = 1
        self.wandb_run = None  # optional; set by the CLI entry point
        self._lr_table = None  # step->lr per group, built lazily by log()

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------

    def train_loaders(self) -> Dict[str, DataLoader]:
        raise NotImplementedError

    def val_loader(self) -> DataLoader:
        """Eval loader: TEST.BATCH_SIZE images PER DEVICE, the global batch
        sharded over the data mesh axis; a trailing partial batch is padded
        with ignore-labeled repeats so histograms are unaffected."""
        test_set = build_dataset(self.cfg, mode="test",
                                 is_source=self.protocol == "source")
        return DataLoader(
            test_set,
            batch_size=self.cfg.TEST.BATCH_SIZE * self.num_devices,
            shuffle=False, num_workers=NUM_WORKERS, seed=self.seed,
            pad_final=True, shard=multihost.loader_shard())

    def _loader_cls(self):
        if str(getattr(self.cfg.TPU, "LOADER", "threads")) == "grain":
            from ..data.grain_loader import GrainLoader
            return GrainLoader
        return DataLoader

    def _loader(self, mode, is_source, batch_size, shuffle=True,
                epochwise=False, drop_last=True):
        ds = build_dataset(self.cfg, mode=mode, is_source=is_source,
                           epochwise=epochwise)
        workers = int(getattr(self.cfg.TPU, "LOADER_WORKERS", NUM_WORKERS))
        return self._loader_cls()(
            ds, batch_size=batch_size, shuffle=shuffle,
            num_workers=workers, seed=self.seed, drop_last=drop_last,
            shard=multihost.loader_shard())

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------

    def global_batch(self) -> int:
        return self.cfg.SOLVER.BATCH_SIZE * self.num_devices

    def num_steps(self) -> int:
        return self.cfg.SOLVER.NUM_ITER // self.num_devices

    # Only the tensors the train step consumes go to device; origin_* maps
    # and path strings stay on host (they exist for the active round).
    _TRAIN_KEYS = ("img", "label", "mask")

    def _shard(self, batch: Dict) -> Dict:
        """Assemble the global device batch. Single-host: a sharded
        device_put. Multi-host: each process contributes its local loader
        slice via make_array_from_process_local_data (the loaders are
        constructed with the matching contiguous shard)."""
        sh = batch_sharding(self.mesh)
        return {k: multihost.make_global_array(v, sh)
                for k, v in batch.items()
                if k in self._TRAIN_KEYS and isinstance(v, np.ndarray)}

    def _eval_batches(self, loader):
        """Yield (img, label) global device arrays sharded over the data
        mesh axis; padded positions get all-ignore labels so they add
        nothing to the IoU histograms."""
        ignore = self.cfg.INPUT.IGNORE_LABEL
        sh = batch_sharding(self.mesh)
        for batch in iter(loader):
            img = np.asarray(batch["img"])
            label = np.asarray(batch["label"])
            pad = batch.get("is_pad")
            if pad is not None and pad.any():
                label = np.where(pad[:, None, None],
                                 np.asarray(ignore, label.dtype), label)
            yield (multihost.make_global_array(img, sh),
                   multihost.make_global_array(label, sh))

    @staticmethod
    def _accumulate_iu(triples):
        """Sum an iterator of (inter, union, target) histogram triples;
        (None, None, None) when the iterator is empty. The single
        accumulation loop behind validate()/test()/_test_rich()."""
        inter = union = target = None
        for it, un, tg in triples:
            if inter is None:
                inter, union, target = it, un, tg
            else:
                inter, union, target = inter + it, union + un, target + tg
        return inter, union, target

    def on_batch_start(self, step: int) -> bool:
        """Returns True if an active round ran (fit() then refreshes its
        loader iterators so prefetched batches don't carry stale masks)."""
        return False

    def _step_lrs(self, step: int) -> Dict[str, float]:
        """Per-group learning rates at `step`, from a precomputed host
        table (one vectorized schedule evaluation at first use; a per-step
        eager jnp call would cost a device dispatch through the relay on
        every log). Reference logs both group LRs each step
        (train_learners.py:210-217)."""
        if self._lr_table is None:
            n = max(self.num_steps(), 1)
            steps = jnp.arange(n)
            self._lr_table = {
                k: np.asarray(jax.vmap(s)(steps), np.float64)
                for k, s in self.schedules.items()}
        i = min(max(step, 0), len(self._lr_table["fea"]) - 1)
        return {"lr_fea": float(self._lr_table["fea"][i]),
                "lr_cls": float(self._lr_table["cls"][i])}

    def log(self, step: int, metrics: Dict, active_round: int = None):
        # fit() logs one step late (see the deferred-logging comment
        # there) and passes the round captured WHEN the step ran — a
        # flush-time read of self.active_round would stamp the step
        # before a round with the round after it.
        if active_round is None:
            active_round = self.active_round
        rec = {"step": step, **{k: float(v) for k, v in metrics.items()},
               **self._step_lrs(step),
               "active_round": int(active_round)}
        self.history.append(rec)
        if step % 50 == 0 or self.debug:
            msg = " ".join(f"{k}={v:.4g}" for k, v in rec.items()
                           if k != "step")
            print(f"[{self.protocol}] step {step}: {msg}", flush=True)
        if self.wandb_run is not None:
            self.wandb_run.log(rec, step=step)
        self._append_jsonl(rec)

    def _append_jsonl(self, rec):
        if not multihost.is_coordinator():
            return  # once-per-run file: coordinator writes, others skip
        path = os.path.join(self.cfg.SAVE_DIR, "metrics.jsonl")
        os.makedirs(self.cfg.SAVE_DIR, exist_ok=True)
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _save_checkpoint(self, filename: str, extra: Optional[Dict] = None):
        """Coordinator-only checkpoint write (the state is replicated, so
        every process holds identical values; one writer avoids torn files
        on a shared filesystem). Barriered so no process resumes before
        the file is durable."""
        if multihost.is_coordinator():
            # learner-level counters ride in `extra` so resume_full can
            # renumber rounds / keep the best-mIoU watermark correctly
            blob = {"active_round": int(self.active_round),
                    "best_miou": float(self.best_miou)}
            blob.update(extra or {})
            save_checkpoint(self.state,
                            os.path.join(self.cfg.SAVE_DIR, filename),
                            extra=blob)
        multihost.sync_hosts(f"ckpt:{filename}")

    def resume_full(self, path: str):
        """Restore the complete trainer state (params, optimizer, step,
        learner counters) for crash-restart — the Lightning .ckpt resume
        equivalent (SURVEY.md §5 checkpoint/resume). Without the counters
        a resumed run would re-save model_before_round_1.ckpt over the
        real round-1 artifact and let the first post-resume validation
        clobber best_mIoU.ckpt."""
        from .state import load_checkpoint_blob

        self.state = restore_state(self.state, path)
        self.state = replicate_tree(self.state, self.mesh)
        extra = load_checkpoint_blob(path).get("extra") or {}
        if "active_round" in extra:
            self.active_round = int(extra["active_round"])
        if "best_miou" in extra:
            self.best_miou = float(extra["best_miou"])
        return int(self.state.step)

    def fit(self, max_steps: Optional[int] = None,
            val_interval: int = 500):
        loaders = self.train_loaders()
        steps = max_steps or self.num_steps()
        start = int(self.state.step)
        iters = {k: iter(v) for k, v in loaders.items()}

        # Preemption handling (SURVEY.md §5: the reference has none): on
        # SIGTERM/SIGINT finish the current step, checkpoint, and exit so
        # `resume_full(preempt.ckpt)` continues exactly where we stopped.
        preempted = {"flag": False}

        def _on_signal(signum, _frame):
            print(f"signal {signum}: checkpointing for preemption...",
                  flush=True)
            preempted["flag"] = True

        import signal
        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # non-main thread (tests)
                pass

        pending = None  # deferred (step, metrics) awaiting host sync
        try:
            for step in range(start, steps):
                # The flag is process-local (the signal may land on one
                # host); agree globally BEFORE branching — a lone host
                # entering the checkpoint barrier while the rest run the
                # collective train step would deadlock both sides.
                # Multi-host, the agreement is a blocking DCN allgather,
                # so poll it every few steps (purely step-gated: every
                # process must reach the collective on the same steps);
                # a few steps of preemption latency is fine and the hot
                # path stays host-sync-free between polls. Single-host
                # the check is a local bool — keep it every step.
                poll = (multihost.process_count() == 1
                        or step % _PREEMPT_POLL_STEPS == 0)
                if poll and multihost.any_host_flag(preempted["flag"]):
                    self._save_checkpoint("preempt.ckpt")
                    print(f"preempted at step {step}; state saved",
                          flush=True)
                    break
                if self.on_batch_start(step):
                    # Active round updated masks on disk. Start a FRESH
                    # epoch: simply re-iterating would replay the batches
                    # already consumed this epoch with the same shuffle
                    # (the loader's epoch only advances at exhaustion),
                    # skewing the stream toward early-epoch samples.
                    # The reference instead keeps its iterators running
                    # with lazy mask pickup (cityscapes.py:232-234) —
                    # our new-epoch restart trades its prefetch staleness
                    # for a deterministic stream.
                    for loader in loaders.values():
                        loader.set_epoch(loader.epoch + 1)
                    iters = {k: iter(v) for k, v in loaders.items()}
                batches = {}
                for k, loader in loaders.items():
                    try:
                        batches[k] = self._shard(next(iters[k]))
                    except StopIteration:
                        # the loader already advanced its epoch counter
                        # at generator exhaustion (loader.py contract,
                        # pinned by test_grain_loader) — bumping it again
                        # here skipped every odd epoch's shuffle stream
                        iters[k] = iter(loader)
                        batches[k] = self._shard(next(iters[k]))
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self.train_step(self.state, batches,
                                                      step_rng)
                # One-step-delayed logging: log() materializes scalars
                # (float(v) is a device sync, expensive through this
                # environment's relay); deferring it until after the NEXT
                # step is dispatched lets host-side batch prep overlap
                # device compute instead of stalling on every step.
                if pending is not None:
                    self.log(*pending)
                pending = (step, metrics, self.active_round)

                if val_interval and (step + 1) % val_interval == 0:
                    self.log(*pending)  # keep log order ahead of eval
                    pending = None
                    miou = self.validate()
                    if miou > self.best_miou:
                        self.best_miou = miou
                        self._save_checkpoint(
                            "best_mIoU.ckpt",
                            extra={"mIoU": miou, "step": step})

            if pending is not None:
                self.log(*pending)
                pending = None
            self._save_checkpoint("last.ckpt")
        finally:
            # always restore, or an exception leaves the no-op handlers
            # installed and the process becomes un-interruptible
            for sig, handler in old_handlers.items():
                import signal as _signal
                _signal.signal(sig, handler)
        return self.history

    def validate(self, loader: Optional[DataLoader] = None,
                 max_batches: Optional[int] = None) -> float:
        """Distributed eval: every device scores TEST.BATCH_SIZE images per
        dispatch (the batch sharded over the data mesh axis) and the I/U
        histograms reduce inside the compiled program — the psum
        replacement for the reference's all_gather-then-sum
        (train_learners.py:130-165), minus its single-GPU-only test
        aggregation bug (:652-654)."""
        loader = loader or self.val_loader()
        batches = self._eval_batches(loader)
        if max_batches is not None:
            batches = itertools.islice(batches, max_batches)
        inter, union, target = self._accumulate_iu(
            self.eval_step(self.state, img, label, flip=True)
            for img, label in batches)
        if inter is None:
            return 0.0
        miou, macc, aacc, iou_c, _ = miou_from_histograms(inter, union,
                                                          target)
        miou = float(miou) * 100
        print(f"\nmIoU: {miou:.2f}\nmAcc: {float(macc) * 100:.2f}\n"
              f"aAcc: {float(aacc) * 100:.2f}\n", flush=True)
        self._append_jsonl({"mIoU": miou, "mAcc": float(macc) * 100,
                            "aAcc": float(aacc) * 100})
        return miou


class SourceLearner(Learner):
    """Plain source-domain CE pretraining (reference :220-269)."""

    protocol = "source"

    def train_loaders(self):
        return {"source": self._loader("train", True, self.global_batch())}


class _ActiveMixin:
    """Active-round scheduling (reference SourceFreeLearner :272-326)."""

    def _init_active(self):
        cfg = self.cfg
        active_set = build_dataset(cfg, mode="active", is_source=False,
                                   epochwise=True)
        # The sweep is sharded over the data mesh axis: every device scores
        # TPU.ACTIVE_BATCH images per dispatch; a trailing partial batch is
        # padded with repeats whose results are discarded (is_pad).
        active_batch = (int(getattr(cfg.TPU, "ACTIVE_BATCH", 1))
                        * self.num_devices)
        self.active_loader = DataLoader(
            active_set,
            batch_size=active_batch,
            shuffle=False, num_workers=NUM_WORKERS, seed=self.seed,
            pad_final=True, shard=multihost.loader_shard(),
            # single-resolution batches for the fused sweep program; a
            # no-op on uniform sets (Cityscapes), required for
            # mixed-resolution target sets at ACTIVE_BATCH > 1
            group_by_size=(active_batch > 1
                           and hasattr(active_set, "native_size")))
        print(">>>>>>>>>>>>>>>> Init Mask >>>>>>>>>>>>>>>>", flush=True)
        # Single writer: the coordinator seeds the 255-masks; the barrier
        # orders the writes before any host's loader reads them (reference
        # guards initMask on LOCAL_RANK being unset, i.e. the pre-spawn
        # rank-0 process, train_learners.py:292-294).
        if multihost.is_coordinator():
            DatasetCatalog.init_mask(cfg)
        multihost.sync_hosts("init_mask")
        self._quant_sweep = None  # lazily built int8 twin (TPU.QUANT_SWEEP)
        self._compute_active_iters()

    def _compute_active_iters(self):
        # SELECT_ITER scaled by the device count, like every other
        # per-run iteration count. The reference's formula
        # (train_learners.py:299-302) multiplies by dataset_len/denom
        # with its repeated-to-NUM_ITER*BATCH dataset, which reduces to
        # the same 1/num_devices scaling — written plainly here.
        self.active_iters = [int(x / self.num_devices)
                             for x in self.cfg.ACTIVE.SELECT_ITER]
        print(f"\nActive learning at iters: {self.active_iters}\n",
              flush=True)

    def _sweep_model_state(self):
        """(model, state, int8?) for the acquisition sweep's eval forward.

        Float — the training model itself — unless ``TPU.QUANT_SWEEP``:
        then a lazily built int8 W8A8 twin (same param tree; the quant
        dispatch is a trace-time knob, models/build.py:163-167),
        PTQ-recalibrated HERE, each round, on the round's own first
        ``QUANT_CALIB_BATCHES`` target batches — params move between
        rounds and the frozen int8 weights snapshot params as of
        calibration (ops/quant.py). The calibration forward is jitted
        once per twin and reused across rounds. Trade measured in
        benchmarks/bench_int8_sweep.py (mask fidelity + endpoint parity
        vs the float sweep; ~25%% faster rounds on the chip)."""
        cfg = self.cfg
        if not bool(getattr(cfg.TPU, "QUANT_SWEEP", False)):
            return self.model, self.state, False
        from ..models import layers as model_layers
        from ..ops import quant as quant_ops
        prev = model_layers.QUANT_EVAL
        try:
            if self._quant_sweep is None:
                qcfg = cfg.clone()
                qcfg.defrost()
                qcfg.TPU.QUANT_EVAL = True
                qmodel = build_segmentor(qcfg)  # flips the quant global
                # quant-collection zeros: shapes depend on architecture
                # constants only (layers.py QuantConv docstring), so a
                # tiny init input suffices
                qvars = qmodel.init(
                    {"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)},
                    jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

                def _calib(v, x, _m=qmodel):
                    _, mut = _m.apply(v, x, train=False, mutable=["quant"])
                    return mut["quant"]

                self._quant_sweep = (qmodel, jax.jit(_calib),
                                     qvars["quant"])
            qmodel, calib, qzero = self._quant_sweep
            # the twin's traces (calibration here, the sweep program in
            # the caller) must see the int8 dispatch
            model_layers.QUANT_EVAL = True
            v = dict(self.state.variables())
            v["quant"] = qzero  # fresh absmax: a running max inherited
            # from the previous round's weights would only ever inflate
            n = max(1, int(getattr(cfg.TPU, "QUANT_CALIB_BATCHES", 2)))
            for batch in itertools.islice(iter(self.active_loader), n):
                v["quant"] = calib(v, jnp.asarray(np.asarray(batch["img"]),
                                                  jnp.float32))
            quant_ops.assert_calibrated(v)
            state = self.state.replace(
                quant=replicate_tree(v["quant"], self.mesh))
            return qmodel, state, True
        finally:
            model_layers.QUANT_EVAL = prev

    def on_batch_start(self, step: int) -> bool:
        if step in self.active_iters and not self.debug:
            name = f"model_before_round_{self.active_round}.ckpt"
            print(f"\nSaving checkpoint: {name}", flush=True)
            self._save_checkpoint(name)
            print(f"\n>>>> Active Round {self.active_round} >>>>",
                  flush=True)
            # The sweep is SPMD over the whole mesh (every process
            # participates; each persists only the images its devices
            # own). The barrier orders all hosts' mask writes before any
            # host's training loader reads them.
            # (Deferred import: region_selection pulls engine.steps, so a
            # module-level import here is a cycle for anyone importing
            # halo_tpu.active first.)
            from ..active.region_selection import region_selection
            from ..models import layers as model_layers
            sweep_model, sweep_state, sweep_int8 = self._sweep_model_state()
            prev_quant = model_layers.QUANT_EVAL
            # the sweep program compiles lazily inside region_selection
            # (per native-size signature, possibly in a LATER round), so
            # the int8 twin's dispatch global must hold across the call
            model_layers.QUANT_EVAL = sweep_int8 or prev_quant
            try:
                stats = region_selection(self.cfg, sweep_model, sweep_state,
                                         self.active_loader,
                                         self.active_round, mesh=self.mesh)
            finally:
                model_layers.QUANT_EVAL = prev_quant
            multihost.sync_hosts(f"active_round_{self.active_round}")
            # per-process disjoint-writer counts -> round totals
            stats = multihost.sum_over_hosts(stats)
            print(f"  selected {stats['picked']} regions / "
                  f"{stats['labeled_px']} px over {stats['images']} images",
                  flush=True)
            self.active_round += 1
            return True
        return False


class SourceFreeLearner(_ActiveMixin, Learner):
    """Target-only active adaptation (reference :272-395)."""

    protocol = "source_free"

    def __init__(self, cfg):
        super().__init__(cfg)
        self._init_active()

    def train_loaders(self):
        return {"target": self._loader("train", False, self.global_batch())}


class SourceTargetLearner(SourceFreeLearner):
    """Source CE + target active CE + LCR + negative (reference :398-486)."""

    protocol = "source_target"

    def train_loaders(self):
        return {"source": self._loader("train", True, self.global_batch()),
                "target": self._loader("train", False, self.global_batch())}


class FullySupervisedLearner(SourceTargetLearner):
    """GT labels on both domains, no selection (reference :489-586)."""

    protocol = "fully_sup"

    def __init__(self, cfg):
        Learner.__init__(self, cfg)  # no active loader/rounds...
        # ...but the target train loader still reads mask PNGs, so they
        # must exist (the reference reaches initMask through
        # SourceFreeLearner.__init__, train_learners.py:292-294,495-497).
        if multihost.is_coordinator():
            DatasetCatalog.init_mask(cfg)
        multihost.sync_hosts("init_mask")
        self.active_iters = []

    def on_batch_start(self, step: int):
        pass


class _CalibImages:
    """Image-only view of a target dataset for PTQ calibration: reads just
    the image files from the split's data_list and applies the given
    (test) transform with an all-ignore label pair, so the active-mask
    store is never touched (a pure serving run has no gtMask files)."""

    def __init__(self, ds, transform):
        self.split = ds.split
        self.active = getattr(ds, "active", False)
        self._files = ds.data_list
        self._transform = transform

    def __len__(self):
        return len(self._files)

    def __getitem__(self, index, rng=None):
        from PIL import Image
        image = Image.open(self._files[index]["img"]).convert("RGB")
        w, h = image.size
        pair = np.full((h, w, 2), 255, np.uint8)
        image, pair = self._transform(image, pair, rng)
        return {"img": image, "label": pair[..., 0].astype(np.int32)}


class TestLearner(Learner):
    """Evaluation-only runtime (reference Test, :589-715)."""

    protocol = "test"

    def __init__(self, cfg):
        super().__init__(cfg)
        # int8 W8A8 serving path: PTQ calibration must follow the weight
        # load (the frozen int8 kernels snapshot params as of calibration
        # — ops/quant.py), so it runs here, after Learner.__init__ has
        # applied MODEL.WEIGHTS/resume. The training protocols keep the
        # float path; only this serving surface calibrates. A resume from
        # an already-calibrated checkpoint (state.py carries `quant`
        # through load_module_params) keeps its scales — recalibration is
        # opt-in via TPU.QUANT_RECALIBRATE.
        if bool(getattr(cfg.TPU, "QUANT_EVAL", False)):
            from ..ops import quant as quant_ops
            try:
                quant_ops.assert_calibrated(self.state.variables())
                restored_calibrated = True
            except ValueError:
                restored_calibrated = False
            if (not restored_calibrated or
                    bool(getattr(cfg.TPU, "QUANT_RECALIBRATE", False))):
                self._calibrate_quant()

    def _calib_loader(self):
        """Calibration batches come from the TARGET TRAIN split under the
        TEST transform — serving-shaped inputs that are disjoint from the
        eval split being scored (standard PTQ hygiene: calibrating on the
        first val batches leaks the eval distribution into the serving
        scales). The split is read image-only (_CalibImages): a pure
        serving run has no gtMask store, and calibration needs no labels.
        Falls back to the val loader when the train split is unavailable
        (e.g. a val-only dataset drop)."""
        from ..data.build import build_transform
        cfg = self.cfg
        try:
            transform = build_transform(cfg, "test", is_source=False)
            ds = DatasetCatalog.get(
                cfg.DATASETS.TARGET_TRAIN, "train",
                num_classes=cfg.MODEL.NUM_CLASSES, transform=None, cfg=cfg)
            if len(ds) == 0:
                raise RuntimeError("empty target train split")
        except Exception as e:  # pragma: no cover - degraded environments
            print(f"quant calibration: target train split unavailable "
                  f"({e}); falling back to the eval split")
            return self.val_loader()
        return DataLoader(
            _CalibImages(ds, transform),
            batch_size=cfg.TEST.BATCH_SIZE * self.num_devices,
            shuffle=False, num_workers=NUM_WORKERS, seed=self.seed,
            pad_final=True, shard=multihost.loader_shard())

    def _calibrate_quant(self):
        from ..ops import quant as quant_ops
        n = max(1, int(getattr(self.cfg.TPU, "QUANT_CALIB_BATCHES", 2)))
        imgs = [img for img, _ in
                itertools.islice(self._eval_batches(self._calib_loader()), n)]
        variables = quant_ops.calibrate(
            self.model, self.state.variables(), imgs)
        self.state = self.state.replace(
            quant=replicate_tree(variables["quant"], self.mesh))
        quant_ops.assert_calibrated(self.state.variables())

    def train_loaders(self):  # pragma: no cover
        raise RuntimeError("TestLearner does not train")

    def test(self, max_batches: Optional[int] = None) -> Dict:
        cfg = self.cfg
        rich = bool(cfg.TEST.SAVE_EMBED or cfg.TEST.VIZ_WRONG)
        if rich:
            inter, union, target = self._test_rich(max_batches)
        else:
            # Plain eval shards the batch over the data mesh axis; the
            # I/U histograms reduce inside the compiled program (the psum
            # replacement for the reference's all_gather, :643-645).
            batches = self._eval_batches(self.val_loader())
            if max_batches is not None:
                batches = itertools.islice(batches, max_batches)
            inter, union, target = self._accumulate_iu(
                self.eval_step(self.state, img, label, flip=True)
                for img, label in batches)
        if inter is None:
            raise RuntimeError(
                "test(): the eval loader yielded no batches "
                "(empty val split or max_batches=0)")
        miou, macc, aacc, iou_c, acc_c = miou_from_histograms(
            inter, union, target)
        result = {
            "mIoU": float(miou) * 100,
            "mAcc": float(macc) * 100,
            "aAcc": float(aacc) * 100,
            "iou_class": [float(x) * 100 for x in iou_c],
        }
        if self.cfg.MODEL.NUM_CLASSES == 16:
            result["mIoU*"] = float(miou_star(iou_c)) * 100
        # per-class table + LaTeX row (reference :664-674)
        from ..data.datasets import TRAINID2NAME_16, TRAINID2NAME_19
        names = (TRAINID2NAME_16 if self.cfg.MODEL.NUM_CLASSES == 16
                 else TRAINID2NAME_19)
        for idx, iou in enumerate(result["iou_class"]):
            print(f"{names[idx]:>12s}: {iou:6.2f}")
        print(" & ".join(f"{x:.1f}" for x in result["iou_class"])
              + f" & {result['mIoU']:.1f}")
        print(f"mIoU: {result['mIoU']:.2f}")
        return result

    def _test_rich(self, max_batches: Optional[int] = None):
        """Artifact-dumping eval (embed/pred dumps, wrong-viz panels):
        inherently per-image host IO, so it runs unsharded at
        TEST.BATCH_SIZE like the reference's manual loop
        (train_learners.py:598-623)."""
        cfg = self.cfg
        from .steps import make_rich_eval_step
        rich_step = make_rich_eval_step(cfg, self.model)
        viz_list = set(np.random.RandomState(
            max(cfg.SEED, 0) + 1).randint(0, 500, 20).tolist())
        test_set = build_dataset(cfg, mode="test", is_source=False)
        loader = DataLoader(test_set, batch_size=cfg.TEST.BATCH_SIZE,
                            shuffle=False, num_workers=NUM_WORKERS,
                            seed=self.seed)
        def triples():
            for i, batch in enumerate(iter(loader)):
                if max_batches is not None and i >= max_batches:
                    break
                # numpy (not jnp): host-local jax.Arrays can't feed a jit
                # whose state is replicated over a multi-host mesh; numpy
                # inputs are treated as replicated, and the unsharded
                # loader yields identical rows on every host
                img = np.asarray(batch["img"])
                label = np.asarray(batch["label"])
                r = rich_step(self.state, img, label, flip=True)
                name = (batch["name"][0].rsplit("/", 1)[-1]
                        .rsplit("_", 1)[0] if batch.get("name") else str(i))
                # Every process launches the same programs (the state is
                # sharded over the global mesh, so compute must be SPMD),
                # but only the coordinator writes the artifact files —
                # concurrent writers to one shared-FS path tear them.
                if multihost.is_coordinator():
                    if cfg.TEST.SAVE_EMBED:
                        self._save_artifacts(r, label, name)
                    if cfg.TEST.VIZ_WRONG and i in viz_list:
                        self._viz_wrong(r, img, label, name)
                yield r["inter"], r["union"], r["target"]

        return self._accumulate_iu(triples())

    def _save_artifacts(self, r, label, name):
        """Dump embed/pred/output/label tensors (reference
        save_embeddings, train_learners.py:608-623, 710-715)."""
        embed_dir = os.path.join(self.cfg.SAVE_DIR, "embed")
        os.makedirs(embed_dir, exist_ok=True)
        blob = {"label": np.asarray(label),
                "pred": np.asarray(r["pred"]),
                "output": np.asarray(r["prob"])}
        if "embed" in r:
            blob["embed"] = np.asarray(r["embed"])
        try:
            import torch
            torch.save({k: torch.from_numpy(v) for k, v in blob.items()},
                       os.path.join(embed_dir, name + ".pt"))
        except ImportError:
            np.savez_compressed(os.path.join(embed_dir, name + ".npz"),
                                **blob)

    def _viz_wrong(self, r, img, label, name):
        from ..utils.visualize import denormalize_image, visualize_wrong
        from ..ops.resize import resize_bilinear as _rb
        size = label.shape[1:3]
        img_native = np.asarray(_rb(img[0].astype(jnp.float32),
                                    tuple(int(s) for s in size)))
        mean = np.asarray(self.cfg.INPUT.PIXEL_MEAN) * 255.0
        std = np.asarray(self.cfg.INPUT.PIXEL_STD) * 255.0
        radius = np.asarray(r.get("radius",
                                  jnp.zeros(r["pred"].shape)))[0]
        visualize_wrong(
            denormalize_image(img_native, mean, std),
            np.asarray(r["pred"][0]), np.asarray(label[0]),
            np.asarray(r["entropy"][0]), radius,
            np.asarray(r["entropy"][0]) * radius,
            os.path.join(self.cfg.SAVE_DIR, "viz", "wrong", name + ".png"),
            ignore_label=self.cfg.INPUT.IGNORE_LABEL)


PROTOCOLS = {
    "source": SourceLearner,
    "source_free": SourceFreeLearner,
    "source_target": SourceTargetLearner,
    "fully_sup": FullySupervisedLearner,
    "test": TestLearner,
}


def build_learner(cfg) -> Learner:
    """Protocol dispatch (reference: train.py:31-36,103-107)."""
    if cfg.PROTOCOL not in PROTOCOLS:
        raise NotImplementedError(f"Unknown protocol: {cfg.PROTOCOL}")
    return PROTOCOLS[cfg.PROTOCOL](cfg)
