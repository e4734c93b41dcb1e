"""Evaluation entry point: ``python test.py -cfg PATH [KEY VALUE ...]``
(reference: test.py:12-33). Flip-TTA inference over the val split with the
per-class IoU table and LaTeX row; metric reduction is a compiled psum
rather than the reference's (single-GPU-only) local aggregation
(train_learners.py:652-654 bug, documented in SURVEY.md §7)."""

import os

import jax

# Multi-host TPU pods: same bootstrap as train.py — without it every
# process thinks it is the single-process coordinator, evaluates the full
# split, and concurrently writes the same metrics/embed files.
if int(os.environ.get("HALO_MULTIHOST", "0")):
    jax.distributed.initialize()

from halo_tpu.config import cfg
from halo_tpu.engine import TestLearner
from halo_tpu.utils.misc import mkdir, parse_args


def main():
    parse_args(description=(
        "Active Domain Adaptive Semantic Segmentation Testing (TPU)"))
    if cfg.SAVE_DIR:
        mkdir(cfg.SAVE_DIR)
    learner = TestLearner(cfg)
    result = learner.test()
    return result


if __name__ == "__main__":
    main()
