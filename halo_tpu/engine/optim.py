"""Optimizers & LR schedules with torch-parity semantics.

Re-implements the reference's optimization setup (reference:
core/train_learners.py:167-208) in optax:

  * two parameter groups: feature_extractor at BASE_LR, classifier at
    BASE_LR*10, both SGD(momentum=0.9, weight_decay=5e-4).
  * schedule: LinearLR warmup (start_factor=0.01 over WARMUP_ITERS) into
    PolynomialLR(power) over (NUM_ITER//n_dev - WARMUP_ITERS) steps.
  * the reference uses geoopt RiemannianSGD when MODEL.HYPER
    (train_learners.py:169-171) — but the hyperbolic head's P_MLR/A_MLR are
    plain ``nn.Parameter``s living in Euclidean space, so RiemannianSGD's
    retraction degenerates to the identity and the update equals plain SGD
    (SURVEY.md §7 hard-part 2). ``riemannian_sgd`` therefore IS torch-SGD
    with the projection hook available for true manifold params.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax


def torch_warmup_poly_schedule(base_lr: float, warmup_iters: int,
                               total_iters: int, power: float,
                               start_factor: float = 0.01):
    """torch SequentialLR(LinearLR, PolynomialLR) parity.

    torch semantics (SequentialLR at milestone=warmup_iters):
      t < W:  lr = base * (start + (1-start) * t / W)
      t >= W: lr = base * max(0, 1 - (t-W)/P) ** power,  P = total - W
    """
    poly_iters = max(total_iters - warmup_iters, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.float32(max(warmup_iters, 1))
        warm = base_lr * (start_factor + (1.0 - start_factor)
                          * jnp.minimum(step, w) / w)
        # (P - t') / P rather than 1 - t'/P: exact when t' -> P in f32.
        remain = jnp.clip((poly_iters - (step - warmup_iters)) / poly_iters,
                          0.0, 1.0)
        poly = base_lr * remain ** power
        if warmup_iters <= 0:
            return poly
        return jnp.where(step < warmup_iters, warm, poly)

    return schedule


def torch_sgd(learning_rate, momentum=0.9, weight_decay=0.0):
    """torch.optim.SGD parity: g <- g + wd*p; v <- mu*v + g; p <- p - lr*v."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*parts)


# Euclidean parameters make geoopt's RiemannianSGD equal to SGD; kept as a
# named alias so configs/logs read the same as the reference.
riemannian_sgd = torch_sgd


def build_optimizer(cfg, num_devices: int = 1):
    """Two-group SGD over the Segmentor param tree
    (top-level keys: 'feature_extractor', 'classifier')."""
    total = cfg.SOLVER.NUM_ITER // max(num_devices, 1)
    warmup = cfg.SOLVER.WARMUP_ITERS
    power = cfg.SOLVER.LR_POWER

    fea_sched = torch_warmup_poly_schedule(
        cfg.SOLVER.BASE_LR, warmup, total, power)
    cls_sched = torch_warmup_poly_schedule(
        cfg.SOLVER.BASE_LR * 10, warmup, total, power)

    opt = torch_sgd if not cfg.MODEL.HYPER else riemannian_sgd
    tx = optax.multi_transform(
        {"fea": opt(fea_sched, cfg.SOLVER.MOMENTUM,
                    cfg.SOLVER.WEIGHT_DECAY),
         "cls": opt(cls_sched, cfg.SOLVER.MOMENTUM,
                    cfg.SOLVER.WEIGHT_DECAY)},
        param_labels=lambda params: jax.tree_util.tree_map_with_path(
            lambda path, _: "fea" if path[0].key == "feature_extractor"
            else "cls", params),
    )
    return tx, {"fea": fea_sched, "cls": cls_sched}
