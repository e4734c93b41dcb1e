"""Training entry point: ``python train.py -cfg PATH [KEY VALUE ...]``.

CLI-compatible with the reference (reference: train.py:75-144) but the
Trainer is the TPU-native Learner runtime: one jitted SPMD program over a
device mesh instead of Lightning DDP process spawning.
"""

import os
import random

import jax

# Multi-host TPU pods: initialize the distributed runtime before any
# device access (single-process runs are unaffected).
if int(os.environ.get("HALO_MULTIHOST", "0")):
    jax.distributed.initialize()

from halo_tpu.config import cfg
from halo_tpu.engine import build_learner
from halo_tpu.parallel import multihost
from halo_tpu.utils.misc import mkdir, parse_args


def main():
    args = parse_args(description=(
        "Active Domain Adaptive Semantic Segmentation Training (TPU)"))
    print(args, end="\n\n")

    if cfg.SAVE_DIR:
        mkdir(cfg.SAVE_DIR)

    try:  # optional: ps-visible process title (reference train.py:83)
        import setproctitle
        setproctitle.setproctitle(cfg.NAME)
    except ImportError:
        pass

    wandb_run = None
    if cfg.WANDB.ENABLE and not cfg.DEBUG:
        try:
            import wandb
            wandb_run = wandb.init(
                project=cfg.WANDB.PROJECT, name=cfg.NAME,
                entity=cfg.WANDB.ENTITY, group=cfg.WANDB.GROUP,
                config=dict(cfg), dir=".")
        except Exception as e:  # zero-egress envs: log locally only
            print(f"wandb disabled: {e}")

    print(f"\n\n>>>>>>>>>>>>>> PROTOCOL: {cfg.PROTOCOL} <<<<<<<<<<<<<<\n")
    print(f"devices: {jax.devices()}\n")

    learner = build_learner(cfg)
    learner.wandb_run = wandb_run
    learner.fit(val_interval=int(getattr(cfg.TPU, "VAL_INTERVAL", 500)))

    if wandb_run is not None:
        wandb_run.finish()

    # End-of-run mask-store cleanup (reference train.py:147-162 rmtree's
    # both unconditionally). Opt-in here: retaining the store keeps the
    # run resumable; coordinator-only so multi-host peers don't race the
    # delete against each other.
    if cfg.TPU.CLEANUP_MASKS and multihost.is_coordinator():
        import shutil
        for sub in ("gtIndicator", "gtMask"):
            path = os.path.join(cfg.SAVE_DIR, sub)
            if os.path.exists(path):
                print(f"Removing {sub} directory...")
                shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
