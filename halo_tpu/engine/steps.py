"""Pure, jittable train/eval step functions for all four protocols.

One step library replaces the reference's five LightningModules' hand-rolled
``training_step`` bodies (reference: core/train_learners.py:224-586). Each
builder returns a function ``(state, batches, rng) -> (state, metrics)``
that jits into a single XLA program: both forwards, the loss stack, the
backward pass, the two-group SGD update, and (under a sharded mesh) the
gradient psum — where the reference pays Lightning dispatch, DDP hooks and
bucketed NCCL per step.

Loss stack per protocol (train_learners.py):
  source        : CE(src)                                    (:224-244)
  source_free   : CE(tgt active mask) + NEG*negative         (:337-366)
  source_target : CE(src) + CE(tgt mask) + LCR*consistency(src) + NEG*negative
                                                             (:404-461)
  fully_sup     : CE(src) + CE(tgt GT) + LCR + NEG           (:505-561)

The reference's ``if torch.sum(tgt_mask != 255) != 0`` guard (:337) is
replaced by the masked-CE returning exactly 0 over an all-ignored mask —
same loss, no data-dependent branch, jit-stable.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..losses import (cross_entropy_loss, local_consistent_loss,
                      negative_learning_loss)
from .state import TrainState


def make_forward(model):
    """forward = classifier(feature_extractor(x), size=input_hw)
    (reference: train_learners.py:52-55). Returns (logits, aux)."""

    def forward(variables, x, train, rng=None, mutable=False,
                size="input"):
        size = x.shape[1:3] if size == "input" else size
        kwargs = {}
        if rng is not None:
            kwargs["rngs"] = {"dropout": rng}
        if mutable:
            return model.apply(variables, x, size=size, train=train,
                               mutable=["batch_stats"], **kwargs)
        return model.apply(variables, x, size=size, train=train, **kwargs)

    return forward


def _merge_stats(a: Dict, b: Dict, old: Dict, decay: float = None) -> Dict:
    """Merge batch_stats updates from two forwards into the reference's
    sequential semantics (reference: train_learners.py:410-424 — both
    forwards run through the same BN modules, so momentum applies twice
    per step). Flax computes each update from the SAME pre-step stats
    ``old``: a = d*old + (1-d)*batch1, b = d*old + (1-d)*batch2 with
    d = 1 - torch momentum (layers.py:118). The sequential result
    r2 = d*a + (1-d)*batch2 is therefore exactly d*a + b - d*old.
    Train-mode normalization uses batch stats, so only the running
    buffers (not outputs/grads) are affected.

    ``decay`` is derived from the BatchNorm module constant so it cannot
    silently desync if the momentum ever changes; the flax momentum
    literals in classifier.py:195 / segformer.py:206 must equal this
    same 1-m (= 0.9)."""
    if decay is None:
        from ..models.layers import BatchNorm
        decay = 1.0 - BatchNorm.momentum
    if not a:
        return b
    if not b:
        return a
    return jax.tree_util.tree_map(
        lambda x, y, o: decay * x + y - decay * o, a, b, old)


def make_train_step(cfg, model, tx, protocol: str) -> Callable:
    forward = make_forward(model)
    num_classes = cfg.MODEL.NUM_CLASSES
    ignore = cfg.INPUT.IGNORE_LABEL
    lcr_w = float(cfg.SOLVER.CONSISTENT_LOSS)
    neg_w = float(cfg.SOLVER.NEGATIVE_LOSS)
    neg_tau = float(cfg.SOLVER.NEGATIVE_THRESHOLD)
    lcr_type = cfg.SOLVER.LCR_TYPE

    def loss_fn(params, state: TrainState, batches, rng):
        variables = {"params": params}
        if state.frozen:
            variables["frozen"] = state.frozen
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats

        metrics = {}
        loss = jnp.float32(0)
        new_stats = {}
        mutable = bool(state.batch_stats)

        def fwd(x, key):
            if mutable:
                (out, _aux), updates = forward(variables, x, True, key,
                                               mutable=True)
                return out, updates.get("batch_stats", {})
            out, _aux = forward(variables, x, True, key)
            return out, {}

        rngs = jax.random.split(rng, 2)

        if protocol in ("source", "source_target", "fully_sup"):
            src = batches["source"]
            src_out, stats = fwd(src["img"], rngs[0])
            new_stats = _merge_stats(new_stats, stats, state.batch_stats)
            loss_sup = cross_entropy_loss(src_out, src["label"], ignore)
            loss = loss + loss_sup
            metrics["loss_sup"] = loss_sup
            if lcr_w > 0 and protocol in ("source_target", "fully_sup"):
                lcr = local_consistent_loss(
                    src_out, src["label"], l_type=lcr_type,
                    ignore_index=ignore) * lcr_w
                loss = loss + lcr
                metrics["consistency_loss"] = lcr

        if protocol in ("source_free", "source_target", "fully_sup"):
            tgt = batches["target"]
            tgt_out, stats = fwd(tgt["img"], rngs[1])
            new_stats = _merge_stats(new_stats, stats, state.batch_stats)
            tgt_labels = tgt["label"] if protocol == "fully_sup" \
                else tgt["mask"]
            loss_tgt = cross_entropy_loss(tgt_out, tgt_labels, ignore)
            loss = loss + loss_tgt
            metrics["loss_sup_tgt"] = loss_tgt
            if neg_w > 0:
                p = jax.nn.softmax(tgt_out.astype(jnp.float32), axis=-1)
                neg = negative_learning_loss(p, neg_tau) * neg_w
                loss = loss + neg
                metrics["negative_loss"] = neg

        metrics["loss"] = loss
        return loss, (metrics, new_stats)

    def train_step(state: TrainState, batches, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_stats)), grads = grad_fn(
            state.params, state, batches, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u.astype(p.dtype)), state.params, updates)
        state = state.replace(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=new_stats if new_stats else state.batch_stats,
        )
        return state, metrics

    return train_step


def make_eval_step(cfg, model) -> Callable:
    """Flip-TTA inference + per-image IoU histograms
    (reference: inference, train_learners.py:57-92: forward both
    orientations, bilinear-upsample logits to the *label* resolution,
    softmax, average)."""
    from ..ops.resize import resize_bilinear
    from ..utils.metrics import intersection_and_union

    forward = make_forward(model)
    num_classes = cfg.MODEL.NUM_CLASSES
    ignore = cfg.INPUT.IGNORE_LABEL

    def eval_step(state: TrainState, img, label, flip=True):
        variables = state.variables()
        x = jnp.concatenate([img, img[:, :, ::-1, :]], 0) if flip else img
        # No head upsampling: logits stay at feature res and go straight to
        # label res, exactly like the reference inference path (:70,86).
        out, _ = forward(variables, x, False, size=None)
        size = label.shape[1:3]
        out = resize_bilinear(out.astype(jnp.float32), size)
        p = jax.nn.softmax(out, axis=-1)
        if flip:
            n = img.shape[0]
            p = (p[:n] + p[n:, :, ::-1, :]) / 2.0
        pred = jnp.argmax(p, axis=-1)
        return intersection_and_union(pred, label, num_classes, ignore)

    return partial(jax.jit, static_argnames=("flip",))(eval_step)


def make_rich_eval_step(cfg, model):
    """Flip-TTA inference that also returns the artifacts the reference's
    Test learner can dump/plot: softmax probs, prediction, flip-averaged
    ball embedding, pixel entropy and hyperbolic radius maps
    (reference: inference + save_embeddings, train_learners.py:57-92,
    :598-623, :710-715)."""
    from ..ops import hyperbolic as hyp
    from ..ops.resize import resize_bilinear
    from ..utils.metrics import intersection_and_union

    forward = make_forward(model)
    num_classes = cfg.MODEL.NUM_CLASSES
    ignore = cfg.INPUT.IGNORE_LABEL
    curvature = float(cfg.MODEL.CURVATURE)

    def rich_eval_step(state: TrainState, img, label, flip=True):
        variables = state.variables()
        x = jnp.concatenate([img, img[:, :, ::-1, :]], 0) if flip else img
        out, embed = forward(variables, x, False, size=None)
        size = label.shape[1:3]
        out = resize_bilinear(out.astype(jnp.float32), size)
        p = jax.nn.softmax(out, axis=-1)
        n = img.shape[0]
        if flip:
            p = (p[:n] + p[n:, :, ::-1, :]) / 2.0
        pred = jnp.argmax(p, axis=-1)
        inter, union, target = intersection_and_union(
            pred, label, num_classes, ignore)
        from ..active.scoring import pixel_entropy
        results = {"prob": p, "pred": pred, "inter": inter, "union": union,
                   "target": target, "entropy": pixel_entropy(p)}
        if embed is not None:
            emb = embed.astype(jnp.float32)
            if flip:
                emb = (emb[:n] + emb[n:, :, ::-1, :]) / 2.0
            results["embed"] = emb
            results["radius"] = resize_bilinear(
                hyp.dist0(emb, c=curvature, axis=-1)[..., None],
                size)[..., 0]
        return results

    return partial(jax.jit, static_argnames=("flip",))(rich_eval_step)
