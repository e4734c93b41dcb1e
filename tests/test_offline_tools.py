"""Offline tooling tests: label-info generators (C17) and the budget
plot (C23) — the last PARITY.md rows that had no test coverage.

The generators are exercised through their real CLI (fresh subprocess,
CPU jax, same env-scrubbing as tests/test_multihost_real.py) on tiny
synthetic label trees, and their pickles are fed straight into
``balanced_file_list`` — the training-time consumer (reference:
datasets/generate_gtav_label_info.py:41-89, core/datasets/gtav.py:31-59).
"""

import importlib.util
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from halo_tpu.data.datasets import (ID_TO_TRAINID_16, ID_TO_TRAINID_19,
                                    balanced_file_list)


def _clean_env():
    """CPU-jax env for script subprocesses (axon sitecustomize disarmed,
    mirroring tests/test_multihost_real.py's launcher)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    return env


def _run_script(script, *args):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, script), *args],
        env=_clean_env(), capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc.stdout


def _load_module(relpath, name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, relpath))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# GTAV label-info generator


@pytest.fixture()
def gtav_root(tmp_path):
    """Three 8x8 GTAV-style label maps with known raw-id content."""
    root = tmp_path / "gtav"
    (root / "labels").mkdir(parents=True)
    # raw ids: 7->road(0), 26->car(13), 33->bike(18); 3 is unmapped (255)
    maps = {
        "a.png": [7, 26],        # classes {0, 13}
        "b.png": [26, 33, 3],    # classes {13, 18} (3 remaps to ignore)
        "c.png": [7],            # classes {0}
    }
    for name, ids in maps.items():
        arr = np.full((8, 8), ids[0], np.uint8)
        for j, raw in enumerate(ids[1:], start=1):
            arr[j] = raw  # one row per extra id
        Image.fromarray(arr).save(root / "labels" / name)
    return root, {"a.png": {0, 13}, "b.png": {13, 18}, "c.png": {0}}


def test_gtav_label_info_generator(gtav_root, tmp_path):
    root, expect = gtav_root
    out = tmp_path / "gtav_label_info.p"
    _run_script("datasets/generate_gtav_label_info.py",
                "--root", str(root), "--workers", "2", "--out", str(out))
    with open(out, "rb") as f:
        label_to_file, file_to_label = pickle.load(f)

    assert {k: set(v) for k, v in file_to_label.items()} == expect
    assert len(label_to_file) == 19
    # inverse mapping agrees, only mapped classes populated
    for c in range(19):
        names = {n for n, cls in expect.items() if c in cls}
        assert set(label_to_file[c]) == names
    # the training-time consumer accepts the pickle verbatim
    files = balanced_file_list(label_to_file, file_to_label, 19, 30, seed=0)
    assert len(files) >= 30 and set(files) <= set(expect)


def test_gtav_generator_respects_list_file(gtav_root, tmp_path):
    root, _ = gtav_root
    lst = tmp_path / "list.txt"
    lst.write_text("a.png\nc.png\n")
    out = tmp_path / "subset.p"
    _run_script("datasets/generate_gtav_label_info.py",
                "--root", str(root), "--list", str(lst),
                "--workers", "1", "--out", str(out))
    with open(out, "rb") as f:
        _, file_to_label = pickle.load(f)
    assert set(file_to_label) == {"a.png", "c.png"}


# ---------------------------------------------------------------------------
# SYNTHIA label-info generator (uint16 labels, semantic id in channel 0)


def test_synthia_label_info_generator(tmp_path):
    root = tmp_path / "synthia"
    (root / "GT" / "LABELS").mkdir(parents=True)
    # raw ids: 7->0, 26->12 (car), 15 unmapped
    maps = {"x.png": [7, 26], "y.png": [15, 26]}
    for name, ids in maps.items():
        arr = np.full((8, 8), ids[0], np.uint16)
        arr[1] = ids[-1]
        Image.fromarray(arr).save(root / "GT" / "LABELS" / name)

    out = tmp_path / "synthia_label_info.p"
    _run_script("datasets/generate_synthia_label_info.py",
                "--root", str(root), "--workers", "2", "--out", str(out))
    with open(out, "rb") as f:
        label_to_file, file_to_label = pickle.load(f)

    assert len(label_to_file) == 16
    assert set(file_to_label["x.png"]) == {ID_TO_TRAINID_16[7],
                                           ID_TO_TRAINID_16[26]}
    assert set(file_to_label["y.png"]) == {ID_TO_TRAINID_16[26]}
    assert set(label_to_file[ID_TO_TRAINID_16[26]]) == {"x.png", "y.png"}


def test_shipped_pickles_match_schema():
    """The committed gtav/synthia pickles (VERDICT r2 missing #1) parse
    and satisfy the consumer's invariants."""
    for fname, ncls in [("datasets/gtav_label_info.p", 19),
                        ("datasets/synthia_label_info.p", 16)]:
        with open(os.path.join(_REPO, fname), "rb") as f:
            label_to_file, file_to_label = pickle.load(f)
        assert len(label_to_file) == ncls
        assert file_to_label, fname
        for c, names in enumerate(label_to_file):
            for n in names[:50]:
                assert c in file_to_label[n]


# ---------------------------------------------------------------------------
# budget plot (analysis/budget_plot.py)


def test_budget_plot_overlays_run_logs(tmp_path, monkeypatch):
    bp = _load_module("analysis/budget_plot.py", "budget_plot")

    run = tmp_path / "run_a"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        f.write(json.dumps({"step": 10, "mIoU": 41.0}) + "\n")
        f.write(json.dumps({"step": 20, "loss": 0.5}) + "\n")
        f.write(json.dumps({"step": 30, "mIoU": 55.5}) + "\n")
    assert bp.best_miou_from_log(str(run)) == 55.5

    out = tmp_path / "plot.png"
    monkeypatch.setattr(sys, "argv",
                        ["budget_plot.py", f"5.0:{run}", "--out", str(out)])
    bp.main()
    assert out.exists() and out.stat().st_size > 1000
    # published ablation table is intact (reference analysis/budget_plot.py:5-10)
    assert bp.HALO_MIOU[bp.BUDGETS.index(5.0)] == 74.5


def test_launch_pod_script(tmp_path):
    """The L9 pod runbook (scripts/launch_pod.sh, reference analogue
    docker-compose.yml:17-25): --dry-run prints the exact launch
    command(s) in both modes without executing anything."""
    script = os.path.join(_REPO, "scripts/launch_pod.sh")

    def run(*args):
        return subprocess.run(["bash", script, *args], cwd=_REPO,
                              capture_output=True, text=True)

    # remote mode: one gcloud fan-out to every worker, HALO_MULTIHOST=1
    p = run("--dry-run", "--tpu", "my-v5e-8", "--zone", "us-west4-a",
            "--repo", "/opt/halo", "--",
            "-cfg", "configs/gtav/source_target.yaml", "SEED", "1")
    assert p.returncode == 0, p.stderr
    dry = [l.replace("\\", "") for l in p.stdout.splitlines()
           if l.startswith("DRY-RUN:")]
    assert len(dry) == 1
    assert "gcloud compute tpus tpu-vm ssh my-v5e-8" in dry[0]
    assert "--worker=all" in dry[0]
    assert "HALO_MULTIHOST=1" in dry[0] and "cd /opt/halo" in dry[0]
    assert "-cfg configs/gtav/source_target.yaml SEED 1" in dry[0]

    # local mode (this host is one worker / a single board)
    p = run("--dry-run", "--multihost", "1", "--",
            "-cfg", "configs/gtav/source_target.yaml")
    assert p.returncode == 0, p.stderr
    dry = [l for l in p.stdout.splitlines() if l.startswith("DRY-RUN:")]
    assert len(dry) == 1
    assert "env HALO_MULTIHOST=1 python train.py -cfg" in dry[0]

    # guard rails: --tpu without --zone, and no train args, both refuse
    assert run("--dry-run", "--tpu", "x", "--", "-cfg", "c").returncode == 2
    assert run("--dry-run").returncode == 2
