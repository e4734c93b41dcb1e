"""CI for scripts/verify_parity.py — the turnkey mIoU-parity command.

Real trained weights don't exist in this environment (zero egress), so
the script is driven end-to-end with a FABRICATED reference-format
Lightning checkpoint: the REAL reference model classes (dilated
ResNet-101 trunk + DepthwiseSeparableASPP_Hyper head, imported via
tests/reference_shims), random weights, saved as a ``{"state_dict": ...}``
torch zip with the reference's ``feature_extractor.``/``classifier.``
prefixes (core/utils/misc.py:165-178). That exercises the whole user
path the day real checkpoints appear: .ckpt import -> per-module port ->
flip-TTA eval -> per-class table -> published-table comparison.
"""

import json
import os
import subprocess
import sys

import pytest
import torch

from tests import reference_shims

reference_shims.install()

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    return env


def _fabricate_reference_ckpt(path):
    """Random-weight reference checkpoint with the exact trained-model
    key structure (Lightning zip: state_dict + trainer counters)."""
    from core.configs import cfg as ref_cfg
    from core.models import resnet as ref_resnet
    from core.models.classifier import DepthwiseSeparableASPP_Hyper
    from core.models.layers import FrozenBatchNorm2d

    ref_cfg.MODEL.CURVATURE = 1.0
    torch.manual_seed(0)
    trunk = ref_resnet.resnet101(
        pretrained=False, pretrained_weights=None,
        replace_stride_with_dilation=[False, True, True],
        norm_layer=FrozenBatchNorm2d)
    head = DepthwiseSeparableASPP_Hyper(
        inplanes=2048, dilation_series=[1, 6, 12, 18],
        padding_series=[1, 6, 12, 18], num_classes=19,
        norm_layer=FrozenBatchNorm2d, reduced_channels=16, hfr=True)
    sd = {}
    for k, v in trunk.state_dict().items():
        sd[f"feature_extractor.backbone.{k}"] = v
    for k, v in head.state_dict().items():
        sd[f"classifier.{k}"] = v
    torch.save({"state_dict": sd, "epoch": 1, "global_step": 60000}, path)


def _write_cfg(mini_root, tmp_path):
    from tests.conftest import make_mini_cfg

    cfg = make_mini_cfg(mini_root, tmp_path)
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.MODEL.HYPER = True
    cfg.MODEL.HFR = True
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.MODEL.FREEZE_BN = True
    cfg.PROTOCOL = "test"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DATA_PARALLEL = 1
    cfg.TEST.BATCH_SIZE = 1
    path = str(tmp_path / "parity_cfg.yaml")
    with open(path, "w") as f:
        f.write(cfg.dump())
    return path


def _run(args, timeout=900):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "scripts/verify_parity.py"),
         *args],
        env=_clean_env(), capture_output=True, text=True, timeout=timeout)
    payload = None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            payload = json.loads(line)
    return proc, payload


@pytest.mark.slow
def test_verify_parity_end_to_end(mini_root, tmp_path):
    ckpt = str(tmp_path / "fabricated_halo_5perc.ckpt")
    _fabricate_reference_ckpt(ckpt)
    cfg = _write_cfg(mini_root, tmp_path)

    # Random weights are nowhere near the published 74.5: the script must
    # run the full import->eval->compare path and report the MISS.
    proc, payload = _run(["--ckpt", ckpt, "--budget", "5",
                          "--max-batches", "2", "--cfg", cfg])
    assert proc.returncode == 2, proc.stdout + proc.stderr
    assert payload and payload["parity"] == "FAIL"
    assert payload["expected"] == 74.5 and payload["tol"] == 0.3
    assert 0 <= payload["miou"] < 50
    assert "road" in proc.stdout and "mIoU:" in proc.stdout  # IoU table

    # Determinism + the OK path: expecting the measured value passes.
    proc2, payload2 = _run(["--ckpt", ckpt, "--expected-miou",
                            str(payload["miou"]), "--tol", "0.5",
                            "--max-batches", "2", "--cfg", cfg])
    assert proc2.returncode == 0, proc2.stdout + proc2.stderr
    assert payload2["parity"] == "OK"
    assert abs(payload2["miou"] - payload["miou"]) <= 1e-6


@pytest.mark.slow
def test_verify_parity_rejects_wrong_shape_ckpt(mini_root, tmp_path):
    """A checkpoint whose tensors don't fit the configured model must be
    REFUSED (not silently part-loaded into a garbage parity number)."""
    ckpt = str(tmp_path / "wrong.ckpt")
    sd = {"feature_extractor.backbone.conv1.weight": torch.zeros(8, 3, 3, 3)}
    torch.save({"state_dict": sd}, ckpt)
    cfg = _write_cfg(mini_root, tmp_path)
    proc, _ = _run(["--ckpt", ckpt, "--budget", "5",
                    "--max-batches", "1", "--cfg", cfg])
    assert proc.returncode not in (0, 2)
    assert "mismatch" in (proc.stdout + proc.stderr)
