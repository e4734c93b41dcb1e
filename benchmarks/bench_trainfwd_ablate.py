"""Attribute the 60 ms train-mode fwd overhead (135 vs 75 ms eval):
toggle negative-loss / dropout-rng / live-BN independently."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np
from halo_tpu.config import get_default_cfg
from halo_tpu.engine.steps import make_forward
from halo_tpu.engine.state import state_from_variables
from halo_tpu.engine.optim import build_optimizer
from halo_tpu.losses import cross_entropy_loss, negative_learning_loss
from halo_tpu.models import build_segmentor

B = 2
rng = np.random.default_rng(0)
batch = {
    "source": {"img": jnp.asarray(rng.normal(size=(B, 720, 1280, 3)), jnp.float32),
               "label": jnp.asarray(rng.integers(0, 19, (B, 720, 1280)), jnp.int32)},
    "target": {"img": jnp.asarray(rng.normal(size=(B, 640, 1280, 3)), jnp.float32),
               "mask": jnp.asarray(rng.integers(0, 19, (B, 640, 1280)), jnp.int32)},
}

def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf.reshape(-1)[0])

def timeit(fn, *args, n=8):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n

def build(freeze_bn):
    cfg = get_default_cfg()
    cfg.merge_from_file("configs/gtav/source_target.yaml")
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.MODEL.FREEZE_BN = bool(freeze_bn)
    model = build_segmentor(cfg)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, x0, train=False)
    tx, _ = build_optimizer(cfg, 1)
    state = state_from_variables(variables, tx)
    return cfg, model, state

for freeze_bn in (False, True):
    cfg, model, state = build(freeze_bn)
    forward = make_forward(model)
    neg_tau = float(cfg.SOLVER.NEGATIVE_THRESHOLD)
    ignore = cfg.INPUT.IGNORE_LABEL

    def make_loss(train, with_neg):
        @jax.jit
        def f(params, frozen, stats, batch, key):
            variables = {"params": params}
            if frozen:
                variables["frozen"] = frozen
            if stats:
                variables["batch_stats"] = stats
            if train:
                k1, k2 = jax.random.split(key)
                (src_out, _), _ = forward(variables, batch["source"]["img"],
                                          True, k1, mutable=True)
                (tgt_out, _), _ = forward(variables, batch["target"]["img"],
                                          True, k2, mutable=True)
            else:
                src_out, _ = forward(variables, batch["source"]["img"], False)
                tgt_out, _ = forward(variables, batch["target"]["img"], False)
            loss = cross_entropy_loss(src_out, batch["source"]["label"], ignore)
            loss = loss + cross_entropy_loss(tgt_out, batch["target"]["mask"], ignore)
            if with_neg:
                p = jax.nn.softmax(tgt_out.astype(jnp.float32), axis=-1)
                loss = loss + negative_learning_loss(p, neg_tau)
            return loss
        return f

    key = jax.random.PRNGKey(2)
    for train, with_neg, tag in ((False, False, "eval+CE      "),
                                 (False, True,  "eval+CE+neg  "),
                                 (True,  False, "train+CE     "),
                                 (True,  True,  "train+CE+neg ")):
        f = make_loss(train, with_neg)
        t = timeit(f, state.params, state.frozen, state.batch_stats, batch, key)
        print("freeze_bn=%-5s %s %7.1f ms" % (freeze_bn, tag, t * 1e3), flush=True)
