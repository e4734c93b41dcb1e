"""End-to-end CLI tests: the literal ``python train.py -cfg ...`` and
``python test.py -cfg ... resume <ckpt>`` processes a user runs
(reference surface: train.py:75-162, test.py:12-33).

Every engine test drives Learner.fit() in-process; these run main()'s
full wiring — parse→mkdir→proctitle→build_learner→fit→cleanup flag —
as fresh subprocesses on CPU jax against the synthetic mini dataset
(same env-scrubbing as tests/test_offline_tools.py), and assert the
artifacts a real run leaves behind: active-round checkpoints, best-mIoU
and last checkpoints, metrics.jsonl, the mask/indicator budget
accounting, test.py's IoU table, and TPU.CLEANUP_MASKS.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import make_mini_cfg

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    """CPU-jax env for CLI subprocesses (axon sitecustomize disarmed).
    XLA_FLAGS must go too: conftest's virtual 8-device flag would leak
    in and scale NUM_ITER/SELECT_ITER by 8 like a real 8-chip mesh."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    return env


def _run_cli(script, *args, timeout=900):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, script), *args],
        env=_clean_env(), capture_output=True, text=True, timeout=timeout)
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n--- stdout ---\n"
        f"{proc.stdout[-4000:]}\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


def _write_cfg(mini_root, tmp_path, **overrides):
    """Mini source_target recipe as a YAML file for the -cfg surface."""
    cfg = make_mini_cfg(mini_root, tmp_path)
    cfg.MODEL.NAME = "deeplabv3plus_resnettiny"
    cfg.MODEL.HYPER = True
    cfg.MODEL.HFR = True
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.MODEL.FREEZE_BN = True
    cfg.PROTOCOL = "source_target"
    cfg.SOLVER.BASE_LR = 0.005
    cfg.SOLVER.NUM_ITER = 6
    cfg.SOLVER.BATCH_SIZE = 2
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.ACTIVE.SELECT_ITER = [1, 3]
    cfg.ACTIVE.BUDGET = 0.05
    cfg.ACTIVE.MASK_RADIUS_K = 2
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.VAL_INTERVAL = 3
    cfg.TEST.BATCH_SIZE = 1
    for k, v in overrides.items():
        node, leaf = cfg, k.split(".")
        for part in leaf[:-1]:
            node = node[part]
        node[leaf[-1]] = v
    path = str(tmp_path / "cli_cfg.yaml")
    with open(path, "w") as f:
        f.write(cfg.dump())
    return path, cfg.SAVE_DIR


def _selected_budget(save_dir):
    """Sum selected/active pixels over every indicator file."""
    from halo_tpu.data.masks import load_indicator
    sel = act = 0
    ind_dir = os.path.join(save_dir, "gtIndicator/train")
    for root, _dirs, files in os.walk(ind_dir):
        for f in files:
            ind = load_indicator(os.path.join(root, f))
            sel += int(ind["selected"].sum())
            act += int(ind["active"].sum())
    return sel, act


@pytest.mark.slow
def test_train_and_test_cli_end_to_end(mini_root, tmp_path):
    cfg_path, save_dir = _write_cfg(mini_root, tmp_path)
    # Exercise the KEY VALUE CLI-merge surface too (reference README:95).
    stdout = _run_cli("train.py", "-cfg", cfg_path, "SEED", "2")
    assert "PROTOCOL: source_target" in stdout

    # Checkpoints: one per active round + best-mIoU + final.
    for name in ("model_before_round_1.ckpt", "model_before_round_2.ckpt",
                 "best_mIoU.ckpt", "last.ckpt"):
        assert os.path.exists(os.path.join(save_dir, name)), name

    # metrics.jsonl: one record per step with finite losses, plus the
    # validation record the VAL_INTERVAL=3 cadence wrote.
    with open(os.path.join(save_dir, "metrics.jsonl")) as f:
        records = [json.loads(line) for line in f]
    steps = [r for r in records if "loss" in r]
    assert len(steps) == 6
    assert all(np.isfinite(r["loss"]) for r in steps)
    assert any("mIoU" in r for r in records), "no validation record"

    # Mask/indicator budget accounting over the 2 rounds: selection
    # labeled something, never more than rounds * ceil(H*W*b/9)*9 px,
    # and the active set (selected + suppression halos) contains every
    # selected pixel.
    sel, act = _selected_budget(save_dir)
    per_round = int(np.ceil(32 * 64 * 0.05 / 9)) * 9
    n_imgs = 3
    assert 0 < sel <= 2 * per_round * n_imgs
    assert act >= sel
    # Per-image mask<->indicator<->GT consistency: the labeled mask
    # pixels are EXACTLY the selected pixels whose GT is not ignore, and
    # they carry the GT train-ids (reference: the mask PNG is the GT
    # oracle's answer, core/active/build.py:27-64,162-166).
    from PIL import Image
    from halo_tpu.data.datasets import remap_labels
    from halo_tpu.data.masks import load_indicator, load_mask_png
    mask_root = os.path.join(save_dir, "gtMask/train")
    checked = 0
    for root, _dirs, files in os.walk(mask_root):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), mask_root)
            m = load_mask_png(os.path.join(root, f))
            gt = np.asarray(Image.open(os.path.join(
                mini_root, "cityscapes/gtFine/train", rel)))
            gt = remap_labels(gt, 19, 255)
            ind = load_indicator(os.path.join(
                save_dir, "gtIndicator/train",
                rel.replace("_gtFine_labelIds.png", "_indicator.pth")))
            np.testing.assert_array_equal(
                m != 255, ind["selected"] & (gt != 255))
            np.testing.assert_array_equal(m[m != 255], gt[m != 255])
            checked += 1
    assert checked == n_imgs

    # test.py against the run's final checkpoint: per-class IoU table.
    stdout = _run_cli("test.py", "-cfg", cfg_path, "SEED", "2",
                      "resume", os.path.join(save_dir, "last.ckpt"))
    assert "road" in stdout and "bicycle" in stdout   # per-class rows
    assert "mIoU:" in stdout
    assert " & " in stdout                            # LaTeX row


@pytest.mark.slow
def test_train_cli_cleanup_masks(mini_root, tmp_path):
    """TPU.CLEANUP_MASKS True removes the gtMask/gtIndicator store at the
    end of training (reference train.py:147-162)."""
    cfg_path, save_dir = _write_cfg(
        mini_root, tmp_path, **{"SOLVER.NUM_ITER": 2,
                                "ACTIVE.SELECT_ITER": [0],
                                "TPU.VAL_INTERVAL": 0,
                                "TPU.CLEANUP_MASKS": True})
    _run_cli("train.py", "-cfg", cfg_path)
    assert os.path.exists(os.path.join(save_dir, "last.ckpt"))
    assert not os.path.exists(os.path.join(save_dir, "gtMask"))
    assert not os.path.exists(os.path.join(save_dir, "gtIndicator"))
