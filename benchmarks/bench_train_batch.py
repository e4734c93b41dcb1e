"""Train-step batch-scaling curve: per-chip batch x TPU.REMAT.

VERDICT r4 weak item 4: the source_target step was only ever measured at
the reference's 2+2 images/chip (core/configs/defaults.py:43 BATCH_SIZE
2/GPU), where the fixed ~7 ms optimizer update and head overheads are a
visible fraction of the 270 ms step. This sweep measures the step at
per-chip batch 2/4/8, with and without per-block rematerialization
(TPU.REMAT buys the activation memory larger batches need), publishing
img/s + MFU per point.

Each (batch, remat) config runs in its OWN subprocess: a compile failure
or HBM OOM at large batch must be recorded as that point's result, not
kill the sweep — and the chip's HBM is fully released between configs.

Usage:
  python benchmarks/bench_train_batch.py                 # full sweep
  python benchmarks/bench_train_batch.py --batch 4 --remat 1   # one point
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12
_POINT_TIMEOUT_S = 1500  # first compile through the relay: 10s-6min


def run_point(B, remat):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from halo_tpu.config import get_default_cfg
    from halo_tpu.engine.optim import build_optimizer
    from halo_tpu.engine.state import state_from_variables
    from halo_tpu.engine.steps import make_train_step
    from halo_tpu.models import build_segmentor

    cfg = get_default_cfg()
    cfg.merge_from_file("configs/gtav/source_target.yaml")
    cfg.MODEL.WEIGHTS = ""
    cfg.resume = ""
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.REMAT = bool(remat)

    model = build_segmentor(cfg)
    tx, _ = build_optimizer(cfg, 1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    state = state_from_variables(variables, tx)

    rng = np.random.default_rng(0)
    batch = {
        "source": {
            "img": jnp.asarray(rng.normal(size=(B, 720, 1280, 3)),
                               jnp.float32),
            "label": jnp.asarray(rng.integers(0, 19, (B, 720, 1280)),
                                 jnp.int32)},
        "target": {
            "img": jnp.asarray(rng.normal(size=(B, 640, 1280, 3)),
                               jnp.float32),
            "mask": jnp.asarray(rng.integers(0, 19, (B, 640, 1280)),
                                jnp.int32)},
    }

    # donate the state like the production Learner (learners.py jit):
    # params/momentum update in place — at batch 8 the non-donated step
    # would hold two full optimizer states.
    step_fn = make_train_step(cfg, model, tx, "source_target")
    t0 = time.time()
    compiled = jax.jit(step_fn, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(2)).compile()
    compile_s = time.time() - t0
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        flops = None

    state, metrics = compiled(state, batch, jax.random.PRNGKey(2))
    loss0 = float(metrics["loss"])  # sync; also proves the step ran

    # steady state: the state feeds back through the carry (no hoisting);
    # at >=270 ms/step the relay's ~30 ms dispatch is amortized by the
    # queued chain with one final sync.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        n = 6
        for i in range(n):
            state, metrics = compiled(state, batch, jax.random.PRNGKey(i))
        float(metrics["loss"])
        best = min(best, (time.perf_counter() - t0) / n)

    img_s = 2 * B / best  # src+tgt images per step, reference accounting
    return {
        "batch": B, "remat": bool(remat), "ok": True,
        "step_ms": round(best * 1e3, 1),
        "img_per_s": round(img_s, 2),
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
        "mfu": (round(flops * (1 / best) / V5E_PEAK_BF16, 3)
                if flops else None),
        "compile_s": round(compile_s, 1),
        "loss0": round(loss0, 3),
    }


def sweep():
    rows = []
    for B in (2, 4, 8):
        for remat in (0, 1):
            proc = None
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--batch", str(B), "--remat", str(remat)],
                    capture_output=True, text=True,
                    timeout=_POINT_TIMEOUT_S)
                line = [l for l in proc.stdout.splitlines()
                        if l.startswith("{")]
                if proc.returncode == 0 and line:
                    row = json.loads(line[-1])
                else:
                    text = (proc.stderr or "") + (proc.stdout or "")
                    lines = text.strip().splitlines()
                    # surface the MOST SPECIFIC line: root causes (OOM,
                    # XLA status codes) before generic relay/exception
                    # wrappers — and never the benign single-host
                    # TPU_WORKER_HOSTNAMES teardown warning, which also
                    # matches "Error", appears in SUCCESSFUL runs too,
                    # and once masked the real OOM in a recorded sweep
                    pick = None
                    for key in ("Ran out of memory", "RESOURCE_EXHAUSTED",
                                "LIMIT_EXCEEDED", "INVALID_ARGUMENT",
                                "Exception", "Error", "ERROR", "ABORTED"):
                        hits = [l for l in lines if key in l
                                and "TPU_WORKER_HOSTNAMES" not in l]
                        if hits:
                            pick = hits[-1]
                            break
                    if pick is None:
                        pick = lines[-1] if lines else f"rc={proc.returncode}"
                    row = {"batch": B, "remat": bool(remat), "ok": False,
                           "error": pick.strip()[:300]}
            except subprocess.TimeoutExpired:
                row = {"batch": B, "remat": bool(remat), "ok": False,
                       "error": f"compile/run exceeded {_POINT_TIMEOUT_S}s"}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"metric": "train_batch_scaling", "rows": rows}))
    return rows


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--remat", type=int, default=0)
    args = ap.parse_args()
    if args.batch:
        print(json.dumps(run_point(args.batch, args.remat)))
    else:
        sweep()
