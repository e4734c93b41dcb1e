"""REAL 2-process multi-host test: jax.distributed over a local
coordinator, 4 virtual CPU devices per process (global mesh of 8).

Unlike test_multihost.py (which monkeypatches process_index/count), this
spawns two actual processes, so every multi-process branch of
halo_tpu/parallel/multihost.py — process_allgather, broadcast_one_to_all,
sync_global_devices, make_array_from_process_local_data — executes for
real (the DCN-backend equivalent of the reference's DDP spawn,
reference: train.py:119-141). The worker (tests/multihost_worker.py)
then runs a 3-step source_target fit with one acquisition round; this
parent asserts:

  * both workers saw identical per-step losses,
  * the 2-process run's losses and acquisition masks are IDENTICAL to a
    1-process 8-device run of the same config (global batch assembly
    from per-process shards is exact),
  * single-writer files: exactly one metrics.jsonl stream, masks written
    disjointly by the process that owns each image's devices.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.conftest import build_mini_dataset

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(local_devices: int):
    env = dict(os.environ)
    # A fresh interpreter: CPU platform with N virtual devices, x64 to
    # match the in-tree test environment. The axon sitecustomize must
    # not register the TPU backend (it would initialize PJRT before
    # jax.distributed.initialize) — dropping its trigger disables it.
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_ENABLE_X64"] = "1"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env["PYTHONPATH"] = _REPO
    return env


def _start_workers(nprocs, local_devices, root, out, steps=3):
    port = _free_port()
    os.makedirs(out, exist_ok=True)
    return [
        subprocess.Popen(
            [sys.executable, _WORKER, "--pid", str(p), "--nprocs",
             str(nprocs), "--port", str(port), "--root", str(root),
             "--out", str(out), "--steps", str(steps)],
            env=_env(local_devices), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for p in range(nprocs)
    ]


def _wait_workers(procs, out, timeout=2400):
    """Reap all workers; on timeout KILL them first — a leaked worker
    pins host cores for its full XLA compile and wedges pytest's exit
    (observed: the r3 suite hung on three orphaned workers)."""
    try:
        outs = [p.communicate(timeout=timeout)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.communicate()
        raise
    for p, o in zip(procs, outs):
        assert p.returncode == 0, (
            f"worker {p.args} failed:\n{o[-4000:]}")
    return [json.load(open(os.path.join(out, f"report_p{p}.json")))
            for p in range(len(procs))]


def _collect_masks(save_dir):
    from halo_tpu.data.masks import load_mask_png

    got = {}
    for dirpath, _dirs, files in os.walk(os.path.join(save_dir, "gtMask")):
        for f in files:
            if f.endswith(".png"):
                got[f] = load_mask_png(os.path.join(dirpath, f))
    return got


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    root = build_mini_dataset(tmp_path / "datasets")

    # Staged serially: each worker recompiles the full program set on
    # CPU, and three concurrent compile storms starve a loaded host past
    # any reasonable timeout (the 2p pair must overlap — they rendezvous
    # through the coordinator — but the 1p baseline needn't).
    p1 = _start_workers(1, 8, root, tmp_path / "out1")
    r1 = _wait_workers(p1, tmp_path / "out1")
    p2 = _start_workers(2, 4, root, tmp_path / "out2")
    r2 = _wait_workers(p2, tmp_path / "out2")

    # phase-1 primitives all executed their multi-process branches
    assert all(r["phase1"] == "ok" for r in r2)

    # both processes of the 2p run observed identical losses (the state
    # is replicated; the train step is one SPMD program)
    assert r2[0]["losses"] == r2[1]["losses"]
    assert len(r2[0]["losses"]) == 3
    assert r2[0]["seed"] == r2[1]["seed"] == r1[0]["seed"]

    # ... and they equal the 1-process 8-device run: per-process loader
    # shards reassemble exactly the global batch stream. f32-ULP
    # tolerance: the cross-process (Gloo) gradient psum may reduce in a
    # different order than the single-process fused reduction (observed
    # max 8e-8 relative on step 3).
    np.testing.assert_allclose(r2[0]["losses"], r1[0]["losses"],
                               rtol=1e-6)

    # acquisition masks: bit-identical across the two topologies,
    # written disjointly (each process persists only the images its
    # devices own; together they cover the full target set)
    m1 = _collect_masks(r1[0]["save_dir"])
    m2 = _collect_masks(r2[0]["save_dir"])
    assert m1 and m1.keys() == m2.keys()
    for k in m1:
        np.testing.assert_array_equal(m1[k], m2[k])
    # the round actually labeled something
    assert any((m != 255).any() for m in m2.values())

    # single-writer metrics.jsonl: same records as the 1-process run
    j1 = [json.loads(l) for l in
          open(os.path.join(r1[0]["save_dir"], "metrics.jsonl"))]
    j2 = [json.loads(l) for l in
          open(os.path.join(r2[0]["save_dir"], "metrics.jsonl"))]
    assert [r["step"] for r in j1] == [r["step"] for r in j2]
    assert len(j2) == 3
