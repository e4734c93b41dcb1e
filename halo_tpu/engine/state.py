"""Train state + checkpoint I/O.

State is an explicit pytree (params / frozen BN buffers / live batch stats /
optimizer state / step) — the functional replacement for the reference's
LightningModule attributes. Checkpoints serialize that tree with flax
msgpack into a single file; ``load_checkpoint`` supports per-module
filtering like the reference loader (reference: core/utils/misc.py:165-188,
which filters ``state_dict`` by ``feature_extractor.``/``classifier.``
prefixes).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import serialization, struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    frozen: Any
    batch_stats: Any
    opt_state: Any
    # int8 PTQ state (amax/w_int8/w_scale per quantized layer) for
    # TPU.QUANT_EVAL builds; empty otherwise (ops/quant.py). Rides the
    # state so eval steps and checkpoints carry the calibration.
    quant: Any = struct.field(default_factory=dict)

    def variables(self) -> Dict:
        v = {"params": self.params}
        if self.frozen:
            v["frozen"] = self.frozen
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.quant:
            v["quant"] = self.quant
        return v


def state_from_variables(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        quant=variables.get("quant", {}),
    )


def save_checkpoint(state: TrainState, path: str,
                    extra: Optional[Dict] = None):
    """Write {params, frozen, batch_stats, opt_state, step, extra} msgpack."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
        "frozen": jax.device_get(state.frozen),
        "batch_stats": jax.device_get(state.batch_stats),
        # to_state_dict: optax NamedTuple states -> plain nested dicts
        "opt_state": serialization.to_state_dict(
            jax.device_get(state.opt_state)),
        "quant": jax.device_get(state.quant),
        "extra": extra or {},
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))


def load_checkpoint_blob(path: str) -> Dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_state(state: TrainState, path: str) -> TrainState:
    """Full-state restore (resume training)."""
    blob = load_checkpoint_blob(path)
    return TrainState(
        step=jnp.asarray(blob["step"]),
        params=serialization.from_state_dict(state.params, blob["params"]),
        frozen=serialization.from_state_dict(state.frozen, blob["frozen"]),
        batch_stats=serialization.from_state_dict(
            state.batch_stats, blob["batch_stats"]),
        opt_state=serialization.from_state_dict(
            state.opt_state, blob["opt_state"]),
        # pre-quant checkpoints have no "quant" key; a float build
        # restoring a quantized checkpoint keeps its empty dict
        quant=(_restore_quant(state.quant, blob["quant"])
               if state.quant and blob.get("quant") else state.quant),
    )


def _restore_quant(container, blob_quant):
    """Quant-tree restore that tolerates eligibility drift: a checkpoint
    calibrated before ``quant_eligible`` changed (e.g. the round-4
    strided-conv extension) has a different set of quantized layers than
    the current build. Structure mismatch must NOT kill the restore —
    the calibration is simply stale, so keep the build's fresh
    (uncalibrated) leaves and let TestLearner's assert_calibrated check
    route to recalibration (engine/learners.py)."""
    try:
        return serialization.from_state_dict(container, blob_quant)
    except (ValueError, KeyError) as e:
        import warnings
        warnings.warn(
            "checkpoint quant state does not match this build's quantized "
            f"layer set (eligibility drift?) — ignoring it: {e}")
        return container


def load_module_params(state: TrainState, path: str,
                       module: str) -> TrainState:
    """Load only one submodule's params/buffers from a checkpoint, like the
    reference's per-module prefix filtering (misc.py:165-178). ``module`` is
    'feature_extractor' or 'classifier'. Torch .pth/.ckpt checkpoints are
    routed through models.port_torch."""
    if path.endswith((".pth", ".tar")) or _looks_torch(path):
        from ..models.port_torch import load_torch_module_params
        return load_torch_module_params(state, path, module)
    blob = load_checkpoint_blob(path)

    def merge(container, blob_container):
        if module not in blob_container:
            return container
        new = dict(container)
        new[module] = serialization.from_state_dict(
            container[module], blob_container[module])
        return new

    params = merge(state.params, blob.get("params", {}))
    frozen = merge(state.frozen, blob.get("frozen", {})) if state.frozen \
        else state.frozen
    batch_stats = merge(state.batch_stats, blob.get("batch_stats", {})) \
        if state.batch_stats else state.batch_stats
    # PTQ state mirrors the module tree, so a quantized build restoring a
    # calibrated checkpoint gets its scales back and the serving entry can
    # skip recalibration (TestLearner checks assert_calibrated). Merged
    # through the drift-tolerant restore: a quant tree written before an
    # eligibility change keeps the build uncalibrated instead of crashing.
    blob_quant = blob.get("quant", {})
    quant = (dict(state.quant,
                  **{module: _restore_quant(state.quant[module],
                                            blob_quant[module])})
             if state.quant and module in blob_quant
             and module in state.quant else state.quant)
    return state.replace(params=params, frozen=frozen,
                         batch_stats=batch_stats, quant=quant)


def _looks_torch(path: str) -> bool:
    """Reference .ckpt files are torch zip archives; ours are msgpack."""
    if not os.path.exists(path):
        return False
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK"  # torch>=1.6 zipfile serialization
