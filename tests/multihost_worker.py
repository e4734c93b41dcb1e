"""Worker process for the REAL 2-process multi-host test.

Launched by tests/test_multihost_real.py as a fresh subprocess (CPU
backend, 4 virtual devices per process, jax.distributed over a local
coordinator). Every multi-process branch of halo_tpu.parallel.multihost —
process_allgather, broadcast_one_to_all, sync_global_devices,
make_array_from_process_local_data — executes for real here; the
in-tree tests only mock them (monkeypatched process_index/count).

Phases:
  1. primitive checks of each multihost helper;
  2. a 3-step source_target fit with one acquisition round on the shared
     mini dataset — the run the parent compares against a 1-process
     8-device run of the same config (losses, masks, metrics.jsonl).

Must be started with env JAX_PLATFORMS=cpu,
XLA_FLAGS=--xla_force_host_platform_device_count=<local>, JAX_ENABLE_X64=1
and WITHOUT the axon sitecustomize trigger (PALLAS_AXON_POOL_IPS unset),
or jax initializes the TPU backend before distributed.initialize runs.
"""

import argparse
import json
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--root", required=True)     # shared mini dataset
    ap.add_argument("--out", required=True)      # shared output dir
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    if args.nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nprocs, process_id=args.pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    from halo_tpu.parallel import multihost

    assert multihost.process_count() == args.nprocs
    assert multihost.process_index() == args.pid

    report = {"pid": args.pid}

    # ---- phase 1: every multihost helper, for real --------------------
    if args.nprocs > 1:
        assert multihost.loader_shard() == (args.pid, args.nprocs)
        assert multihost.is_coordinator() == (args.pid == 0)

        # coordinator's seed wins
        seed = multihost.broadcast_seed(1000 + args.pid)
        assert seed == 1000, seed

        # OR across hosts: a flag raised on ONE host is seen by all
        assert multihost.any_host_flag(args.pid == 1) is True
        assert multihost.any_host_flag(False) is False

        # element-wise sums with types preserved
        tot = multihost.sum_over_hosts(
            {"images": args.pid + 1, "px": 10.5})
        assert tot["images"] == sum(range(1, args.nprocs + 1))
        assert isinstance(tot["images"], int)
        assert abs(tot["px"] - 10.5 * args.nprocs) < 1e-9

        # a key that is int on one host and float on another must not
        # split the collectives differently per host (deadlock class);
        # the agreed partition demotes it to float everywhere
        tot = multihost.sum_over_hosts(
            {"mixed": 0 if args.pid == 0 else 0.5, "n": 1})
        assert isinstance(tot["mixed"], float)
        assert abs(tot["mixed"] - 0.5 * (args.nprocs - 1)) < 1e-9
        assert tot["n"] == args.nprocs and isinstance(tot["n"], int)

        # barrier orders coordinator writes before peer reads
        flag_file = os.path.join(args.out, "barrier_flag")
        if multihost.is_coordinator():
            with open(flag_file, "w") as f:
                f.write("written-before-barrier")
        multihost.sync_hosts("flag_written")
        with open(flag_file) as f:
            assert f.read() == "written-before-barrier"

        # global array assembly from per-process slices + jitted reduce
        from jax.sharding import NamedSharding, PartitionSpec as P
        from halo_tpu.parallel.mesh import batch_sharding, create_mesh

        mesh = create_mesh()
        sh = batch_sharding(mesh)
        n_global = mesh.shape["data"]
        local = (np.arange(n_global, dtype=np.float64)
                 .reshape(args.nprocs, -1)[args.pid])
        garr = multihost.make_global_array(local, sh)
        assert garr.shape == (n_global,)
        tot = jax.jit(lambda x: x.sum(),
                      out_shardings=NamedSharding(mesh, P()))(garr)
        assert float(tot) == sum(range(n_global))
        report["phase1"] = "ok"

    # ---- phase 2: 3-step source_target fit + one acquisition round ----
    import pathlib

    from tests.test_engine import tiny_cfg

    cfg = tiny_cfg(pathlib.Path(args.root), pathlib.Path(args.out),
                   "source_target", devices=len(jax.devices()))
    cfg.ACTIVE.SELECT_ITER = [len(jax.devices())]  # scaled -> step 1
    # the train sets repeat to NUM_ITER*BATCH_SIZE samples (reference
    # build.py:36); keep that above one 8-device global batch
    cfg.SOLVER.NUM_ITER = 16
    from halo_tpu.engine import build_learner

    learner = build_learner(cfg)
    hist = learner.fit(max_steps=args.steps, val_interval=0)
    report["losses"] = [float(h["loss"]) for h in hist]
    report["seed"] = learner.seed
    report["save_dir"] = cfg.SAVE_DIR

    with open(os.path.join(args.out, f"report_p{args.pid}.json"),
              "w") as f:
        json.dump(report, f)
    print(f"worker {args.pid}: done", flush=True)


if __name__ == "__main__":
    main()
