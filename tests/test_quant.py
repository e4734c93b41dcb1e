"""int8 PTQ eval path (TPU.QUANT_EVAL, ops/quant.py, layers.QuantConv).

The reference has no quantized path (its eval runs the fp32/fp16 model,
core/train_learners.py:57-92); these tests pin the TPU-native extension:
exact int8 conv semantics on quantization-grid inputs, param-layout
compatibility with the float build, calibration bookkeeping, and the
end-to-end quantized-vs-float logits envelope on the tiny flagship.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.models import layers as layers_mod
from halo_tpu.models.layers import QuantConv, QuantDense
from halo_tpu.ops import quant


def _cfg(quant_eval):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnettiny"
    cfg.MODEL.HYPER = True
    cfg.MODEL.HFR = True
    cfg.MODEL.REDUCED_CHANNELS = 64
    cfg.MODEL.FREEZE_BN = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.QUANT_EVAL = quant_eval
    return cfg


def _init(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    return model.init(rngs, x, train=train)


@pytest.fixture()
def quant_off():
    """Restore the process-global knob after each test (build_segmentor
    sets it; direct QuantConv tests set it implicitly not at all)."""
    yield
    layers_mod.QUANT_EVAL = False


def test_int8_conv_exact_on_grid(quant_off):
    """With power-of-two scales and grid-aligned inputs, the int8 path is
    BIT-EXACT vs the float conv: products 0.5i * 0.25j = 0.125*ij are
    exact in f32 and the int32 accumulation is exact by construction."""
    rng = np.random.default_rng(0)
    cin, cout = 8, 4
    # x = 0.5 * ints in [-127, 127], containing the extreme so the
    # calibrated amax lands exactly on 63.5 -> sx = 0.5.
    xi = rng.integers(-127, 128, (1, 12, 16, cin))
    xi.flat[0] = 127
    x = jnp.asarray(0.5 * xi, jnp.float32)
    # kernel = 0.25 * ints with per-channel max |int| = 127 -> ws = 0.25.
    ki = rng.integers(-127, 128, (3, 3, cin, cout))
    ki[0, 0, 0, :] = 127
    kernel = jnp.asarray(0.25 * ki, jnp.float32)

    mod = QuantConv(cout, (3, 3), padding=((1, 1), (1, 1)), train=False)
    variables = mod.init(jax.random.PRNGKey(0), x)
    variables = {**variables, "params": {"kernel": kernel}}
    # Calibrate on the grid input itself.
    _, mut = mod.apply(variables, x, mutable=["quant"])
    assert float(mut["quant"]["amax"]) == 63.5
    np.testing.assert_array_equal(
        np.asarray(mut["quant"]["w_int8"]), ki)
    np.testing.assert_array_equal(
        np.asarray(mut["quant"]["w_scale"]), np.full(cout, 0.25, np.float32))

    got = mod.apply({**variables, "quant": mut["quant"]}, x)
    want = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_conv_clips_beyond_amax(quant_off):
    """Activations beyond the calibrated absmax clip to the grid edge."""
    x = jnp.asarray([[[[1.0], [300.0]]]], jnp.float32)  # (1,1,2,1)
    k = jnp.ones((1, 1, 1, 1), jnp.float32)
    y = quant.int8_conv(x, *quant.quantize_weight(k),
                        jnp.float32(127.0), (1, 1), "VALID", (1, 1))
    np.testing.assert_allclose(np.asarray(y)[0, 0, :, 0], [1.0, 127.0])


def test_int8_strided_conv_exact_on_grid(quant_off):
    """Strided QuantConv (the 1.46-1.52x families from
    benchmarks/bench_int8_strided.py — resnet layer2 transitions, MiT
    pe3): above the output-grid threshold the int8 path is bit-exact on
    quantization-grid inputs, same construction as the stride-1 test."""
    rng = np.random.default_rng(2)
    cin, cout = 128, 8
    xi = rng.integers(-127, 128, (1, 96, 96, cin))
    xi.flat[0] = 127
    x = jnp.asarray(0.5 * xi, jnp.float32)
    ki = rng.integers(-127, 128, (3, 3, cin, cout))
    ki[0, 0, 0, :] = 127
    kernel = jnp.asarray(0.25 * ki, jnp.float32)

    # 48*48 = 2304 output positions >= _MIN_STRIDED_POSITIONS
    mod = QuantConv(cout, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), train=False)
    variables = mod.init(jax.random.PRNGKey(0), x)
    variables = {**variables, "params": {"kernel": kernel}}
    _, mut = mod.apply(variables, x, mutable=["quant"])
    assert float(mut["quant"]["amax"]) == 63.5
    got = mod.apply({**variables, "quant": mut["quant"]}, x)
    want = jax.lax.conv_general_dilated(
        x, kernel, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    assert got.shape == (1, 48, 48, cout)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_strided_small_grid_falls_back_to_float(quant_off):
    """Below _MIN_STRIDED_POSITIONS output positions the eval trace IS
    the float conv, bit-identically (the small-GEMM losers: MiT pe4 and
    the SR-KV convs measured 0.89-1.05x — bench_int8_strided.py)."""
    x = jax.random.normal(jax.random.PRNGKey(9), (1, 32, 32, 128),
                          jnp.float32)
    mod = QuantConv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    train=False)
    variables = mod.init(jax.random.PRNGKey(0), x)
    _, mut = mod.apply(variables, x, mutable=["quant"])  # calibrated
    got = mod.apply({**variables, "quant": mut["quant"]}, x)  # 16x16 grid
    want = jax.lax.conv_general_dilated(
        x, variables["params"]["kernel"].astype(jnp.float32), (2, 2),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quant_eligible_strided_gate(quant_off):
    """Static eligibility: stride-1 ungrouped always; strided only with
    the Cin>=128 hint (pe2's Cin=64 measured 0.93x, the stem 1.02x)."""
    from halo_tpu.models.layers import quant_eligible
    layers_mod.QUANT_EVAL = True
    assert quant_eligible((1, 1), 1)
    assert not quant_eligible((2, 2), 1)                    # no hint
    assert not quant_eligible((2, 2), 1, in_features=64)
    assert quant_eligible((2, 2), 1, in_features=128)
    assert not quant_eligible((2, 2), 2, in_features=256)   # grouped
    layers_mod.QUANT_EVAL = False
    assert not quant_eligible((1, 1), 1)


def test_quant_build_param_layout_unchanged(quant_off):
    """params/frozen trees of the quantized build match the float build
    exactly (checkpoints and torch imports are unaffected); the quant
    build only ADDS the `quant` collection."""
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    vq = _init(build_segmentor(_cfg(True)), x)
    vf = _init(build_segmentor(_cfg(False)), x)
    for coll in ("params", "frozen", "batch_stats"):
        assert jax.tree_util.tree_structure(vq[coll]) == \
            jax.tree_util.tree_structure(vf[coll]), coll
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(vq[coll]),
                jax.tree_util.tree_leaves_with_path(vf[coll])):
            assert a.shape == b.shape, (coll, pa)
    assert "quant" in vq and "quant" not in vf
    # Same init RNG -> identical param values too.
    for a, b in zip(jax.tree_util.tree_leaves(vq["params"]),
                    jax.tree_util.tree_leaves(vf["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibrate_and_guard(quant_off):
    model = build_segmentor(_cfg(True))
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3), jnp.float32)
    variables = _init(model, x)
    with pytest.raises(ValueError, match="uncalibrated"):
        quant.assert_calibrated(variables)
    with pytest.raises(ValueError, match="quant"):
        quant.assert_calibrated({"params": {}})
    with pytest.raises(ValueError, match="at least one batch"):
        quant.calibrate(model, variables, [])

    cal1 = quant.calibrate(model, variables, [x])
    quant.assert_calibrated(cal1)
    # Default reset=True: recalibration REPLACES the scales — after an
    # inflating pass on 2x data, recalibrating on x reproduces cal1
    # exactly (an inherited amax would coarsen the grid silently).
    cal_big = quant.calibrate(model, cal1, [2.0 * x])
    cal2 = quant.calibrate(model, cal_big, [x])
    for a1, a2 in zip(jax.tree_util.tree_leaves(cal1["quant"]),
                      jax.tree_util.tree_leaves(cal2["quant"])):
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # reset=False: running max accumulates across calls.
    cal3 = quant.calibrate(model, cal_big, [x], reset=False)
    for (p1, a1), (_p2, a2) in zip(
            jax.tree_util.tree_leaves_with_path(cal_big["quant"]),
            jax.tree_util.tree_leaves_with_path(cal3["quant"])):
        if "amax" in jax.tree_util.keystr(p1):
            assert float(a2) >= float(a1) > 0.0


def test_quantized_logits_close_to_float(quant_off):
    """End-to-end envelope on the tiny flagship: per-tensor-act /
    per-channel-weight int8 through ~10 trunk+decoder convs stays within
    a few percent of the float logits (threshold pinned from the
    deterministic CPU run with margin; it guards regressions like a
    mis-scaled dequant, which shifts relative error to O(1))."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3), jnp.float32)
    model_q = build_segmentor(_cfg(True))
    vq = _init(model_q, x)
    vq = quant.calibrate(model_q, vq, [x])
    out_q, embed_q = model_q.apply(vq, x, train=False)

    model_f = build_segmentor(_cfg(False))
    vf = {k: v for k, v in vq.items() if k != "quant"}
    out_f, embed_f = model_f.apply(vf, x, train=False)

    rel = (np.linalg.norm(np.asarray(out_q - out_f)) /
           np.linalg.norm(np.asarray(out_f)))
    assert np.isfinite(np.asarray(out_q)).all()
    # rel == 0.0 would mean the int8 path never ran (float vs float).
    assert 0.0 < rel < 0.15, rel
    agree = np.mean(np.argmax(np.asarray(out_q), -1) ==
                    np.argmax(np.asarray(out_f), -1))
    assert agree > 0.6, agree


def test_int8_dense_exact_on_grid(quant_off):
    """QuantDense's int8 path is bit-exact vs the float dot on
    quantization-grid inputs (same construction as the conv test:
    power-of-two scales, products exact in f32, int32 accumulation)."""
    rng = np.random.default_rng(1)
    cin, cout = 128, 16
    xi = rng.integers(-127, 128, (4, cin))
    xi.flat[0] = 127
    x = jnp.asarray(0.5 * xi, jnp.float32)
    ki = rng.integers(-127, 128, (cin, cout))
    ki[0, :] = 127
    kernel = jnp.asarray(0.25 * ki, jnp.float32)

    mod = QuantDense(cout, use_bias=False, train=False)
    variables = mod.init(jax.random.PRNGKey(0), x)
    variables = {**variables, "params": {"kernel": kernel}}
    _, mut = mod.apply(variables, x, mutable=["quant"])
    assert float(mut["quant"]["amax"]) == 63.5
    np.testing.assert_array_equal(np.asarray(mut["quant"]["w_int8"]), ki)

    got = mod.apply({**variables, "quant": mut["quant"]}, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x @ kernel))


def test_quant_dense_narrow_fallback(quant_off):
    """Below min_cin input channels QuantDense is a plain float dense —
    no `quant` variables (the K<128 GEMM underfills the MXU lanes and
    int8 measured 0.87x there, benchmarks/bench_int8_mit.py)."""
    x = jax.random.normal(jax.random.PRNGKey(6), (4, 64), jnp.float32)
    mod = QuantDense(32, train=False)
    variables = mod.init(jax.random.PRNGKey(0), x)
    assert "quant" not in variables
    import flax.linen as fnn
    ref = fnn.Dense(32).apply({"params": variables["params"]}, x)
    np.testing.assert_array_equal(np.asarray(mod.apply(variables, x)),
                                  np.asarray(ref))


def _sf_cfg(quant_eval):
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "segformer_mittiny"
    cfg.MODEL.HYPER = True
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.QUANT_EVAL = quant_eval
    return cfg


def test_segformer_quant_build(quant_off):
    """The SegFormer family quantizes through the same knob: identical
    params layout vs the float build, wide dense layers carry quant
    state, narrow (Cin<128) ones stay float, and the calibrated int8
    eval stays within the PTQ envelope of the float logits."""
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 3), jnp.float32)
    # ORDER MATTERS: build_segmentor sets the process-global
    # layers_mod.QUANT_EVAL, which make_dense/make_conv read at TRACE
    # time — so every model_q trace (init, calibrate, the quantized
    # apply) must happen before the float build flips the knob off, or
    # they all silently trace as plain float (the round-3 version of
    # this test did exactly that and asserted rel == 0.0 of float vs
    # float — ADVICE.md r3).
    model_q = build_segmentor(_sf_cfg(True))
    vq = _init(model_q, x)
    names = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_leaves_with_path(vq["quant"])]
    # mittiny dims (16,32,64,128; FFN hidden 4x): stage-4 attention and
    # the stage-2+ fc2 clear min_cin=128; stage-1's narrow layers do not.
    assert any("block4_0" in n for n in names)
    assert not any("block1_0" in n for n in names)
    assert any("fuse_conv" in n for n in names)     # 1x1 QuantConv
    assert not any("mlr" in n or "conv_reduce" in n for n in names)

    vq = quant.calibrate(model_q, vq, [x])
    for p, leaf in jax.tree_util.tree_leaves_with_path(vq["quant"]):
        if "amax" in jax.tree_util.keystr(p):
            assert float(leaf) > 0.0, p
    out_q, _ = model_q.apply(vq, x, train=False)

    model_f = build_segmentor(_sf_cfg(False))
    vf = _init(model_f, x)
    assert jax.tree_util.tree_structure(vq["params"]) == \
        jax.tree_util.tree_structure(vf["params"])
    out_f, _ = model_f.apply({k: v for k, v in vq.items() if k != "quant"},
                             x, train=False)
    rel = (np.linalg.norm(np.asarray(out_q - out_f)) /
           np.linalg.norm(np.asarray(out_f)))
    assert np.isfinite(np.asarray(out_q)).all()
    assert 0.0 < rel < 0.15, rel


def test_quant_state_checkpoint_roundtrip(quant_off, tmp_path):
    """Calibrated PTQ state rides TrainState through save/restore, so a
    serving process can restore a calibrated checkpoint without
    re-calibrating; float-build states (empty quant) are unaffected by
    blobs either way."""
    import optax
    from halo_tpu.engine.state import (restore_state, save_checkpoint,
                                       state_from_variables)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64, 3), jnp.float32)
    model = build_segmentor(_cfg(True))
    v = quant.calibrate(model, _init(model, x), [x])
    tx = optax.sgd(0.1)
    state = state_from_variables(v, tx)
    assert state.quant
    path = str(tmp_path / "q.ckpt")
    save_checkpoint(state, path)

    fresh = state_from_variables(_init(model, x), tx)  # uncalibrated
    with pytest.raises(ValueError, match="uncalibrated"):
        quant.assert_calibrated(fresh.variables())
    restored = restore_state(fresh, path)
    quant.assert_calibrated(restored.variables())
    for a, b in zip(jax.tree_util.tree_leaves(state.quant),
                    jax.tree_util.tree_leaves(restored.quant)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # float build restoring the quantized blob: quant stays empty
    layers_mod.QUANT_EVAL = False
    model_f = build_segmentor(_cfg(False))
    vf = _init(model_f, x)
    state_f = state_from_variables(vf, tx)
    restored_f = restore_state(state_f, path)
    assert not restored_f.quant


def test_quant_restore_tolerates_eligibility_drift(quant_off, tmp_path):
    """A checkpoint calibrated before ``quant_eligible`` changed (e.g.
    the round-4 strided-conv extension) carries a DIFFERENT quantized-
    layer set than the current build. Restoring it must not crash
    (flax from_state_dict raises on structure mismatch): the stale
    quant tree is dropped with a warning, the build stays uncalibrated,
    and TestLearner's assert_calibrated check routes to recalibration
    (engine/state._restore_quant)."""
    import optax
    from flax import serialization
    from halo_tpu.engine.state import (load_checkpoint_blob,
                                       load_module_params, restore_state,
                                       save_checkpoint,
                                       state_from_variables)
    x = jax.random.normal(jax.random.PRNGKey(8), (1, 64, 64, 3), jnp.float32)
    model = build_segmentor(_cfg(True))
    v = quant.calibrate(model, _init(model, x), [x])
    tx = optax.sgd(0.1)
    state = state_from_variables(v, tx)
    path = str(tmp_path / "q.ckpt")
    save_checkpoint(state, path)

    # Simulate drift: drop one quantized layer from the checkpoint tree
    # (as if the checkpoint predated that layer's eligibility).
    blob = load_checkpoint_blob(path)
    fe = blob["quant"]["feature_extractor"]
    fe.pop(sorted(fe)[0])
    drifted = str(tmp_path / "drifted.ckpt")
    with open(drifted, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))

    fresh = state_from_variables(_init(model, x), tx)
    with pytest.warns(UserWarning, match="quant state"):
        restored = restore_state(fresh, drifted)
    with pytest.raises(ValueError, match="uncalibrated"):
        quant.assert_calibrated(restored.variables())
    # the non-quant state still restored
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # per-module path (the resume route TestLearner actually takes)
    with pytest.warns(UserWarning, match="quant state"):
        restored_m = load_module_params(fresh, drifted, "feature_extractor")
    with pytest.raises(ValueError, match="uncalibrated"):
        quant.assert_calibrated(restored_m.variables())


def test_train_mode_passthrough(quant_off):
    """A quantized build in TRAIN mode computes the float forward —
    matching the float build exactly (same emitter calls)."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3), jnp.float32)
    model_q = build_segmentor(_cfg(True))
    vq = _init(model_q, x)
    out_q, _ = model_q.apply(
        vq, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)},
        mutable=["batch_stats"])[0]
    model_f = build_segmentor(_cfg(False))
    vf = {k: v for k, v in vq.items() if k != "quant"}
    out_f, _ = model_f.apply(
        vf, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)},
        mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(out_q), np.asarray(out_f))
