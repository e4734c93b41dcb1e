"""Torch-checkpoint import tests: build a state_dict with the reference's
exact naming scheme (reference: core/models/resnet.py torchvision names;
core/models/classifier.py module attributes) and verify it lands in the
right flax slots with the right layouts."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from tests.conftest import make_mini_cfg
from halo_tpu.engine import build_learner
from halo_tpu.models.port_torch import (load_torch_module_params,
                                        torch_state_dict_to_variables)


def _leaf(tree, *path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


def test_backbone_conv_and_bn_mapping():
    sd = {
        "conv1.weight": torch.arange(64 * 3 * 7 * 7,
                                     dtype=torch.float32).reshape(64, 3, 7, 7),
        "bn1.weight": torch.ones(64) * 2,
        "bn1.bias": torch.ones(64) * 3,
        "bn1.running_mean": torch.ones(64) * 4,
        "bn1.running_var": torch.ones(64) * 5,
        "bn1.num_batches_tracked": torch.tensor(7),
        "layer1.0.conv2.weight": torch.zeros(64, 64, 3, 3),
        "layer1.0.downsample.0.weight": torch.zeros(256, 64, 1, 1),
        "layer1.0.downsample.1.weight": torch.ones(256),
        "fc.weight": torch.zeros(1000, 2048),  # must be dropped
    }
    out = torch_state_dict_to_variables(sd, "feature_extractor",
                                        freeze_bn=True)
    k = _leaf(out["params"], "conv1", "kernel")
    assert k.shape == (7, 7, 3, 64)
    # OIHW -> HWIO: element (o,i,h,w) lands at (h,w,i,o)
    src = sd["conv1.weight"].numpy()
    np.testing.assert_array_equal(k, src.transpose(2, 3, 1, 0))
    assert _leaf(out["frozen"], "bn1", "weight")[0] == 2
    assert _leaf(out["frozen"], "bn1", "running_var")[0] == 5
    assert _leaf(out["params"], "layer1_0", "conv2", "kernel").shape == \
        (3, 3, 64, 64)
    assert _leaf(out["params"], "layer1_0", "downsample_conv",
                 "kernel").shape == (1, 1, 64, 256)
    assert "fc" not in out["params"]


def test_v3plus_hyper_head_mapping():
    C = 16
    sd = {
        "parallel_branches.0.0.weight": torch.zeros(512, 2048, 1, 1),
        "parallel_branches.0.1.weight": torch.ones(512),
        "parallel_branches.1.depthwise_conv.weight":
            torch.zeros(2048, 1, 3, 3),
        "parallel_branches.1.pointwise_conv.weight":
            torch.zeros(512, 2048, 1, 1),
        "parallel_branches.1.depthwise_bn.running_mean": torch.zeros(2048),
        "global_branch.1.weight": torch.zeros(512, 2048, 1, 1),
        "bottleneck.0.weight": torch.zeros(512, 2560, 3, 3),
        "shortcut.0.weight": torch.zeros(48, 256, 1, 1),
        "decoder.0.depthwise_conv.weight": torch.zeros(560, 1, 3, 3),
        "decoder.1.pointwise_conv.weight": torch.zeros(512, 512, 1, 1),
        "conv_reduce.weight": torch.zeros(C, 512, 1, 1),
        "conv_reduce.bias": torch.zeros(C),
        "wn_mlp.0.weight": torch.arange(C * C,
                                        dtype=torch.float32).reshape(C, C),
        "wn_mlp.0.bias": torch.zeros(C),
        "wn_mlp.1.weight": torch.ones(C),
        "wn_mlp.1.running_var": torch.ones(C),
        "wn_mlp.3.weight": torch.zeros(C, C),
        "conv_seg.P_MLR": torch.ones(19, C) * 0.5,
        "conv_seg.A_MLR": torch.ones(19, C) * 0.25,
    }
    out = torch_state_dict_to_variables(sd, "classifier",
                                        head="deeplabv3plus", freeze_bn=True)
    assert _leaf(out["params"], "aspp", "branch_0", "conv",
                 "kernel").shape == (1, 1, 2048, 512)
    assert _leaf(out["frozen"], "aspp", "branch_0", "norm",
                 "weight").shape == (512,)
    assert _leaf(out["params"], "aspp", "branch_1", "depthwise", "conv",
                 "kernel").shape == (3, 3, 1, 2048)
    assert _leaf(out["params"], "aspp", "decoder_0", "depthwise", "conv",
                 "kernel").shape == (3, 3, 1, 560)
    assert _leaf(out["params"], "conv_reduce", "kernel").shape == \
        (1, 1, 512, C)
    # Linear weights transpose (O,I) -> (I,O)
    fc1 = _leaf(out["params"], "hfr", "fc1", "kernel")
    np.testing.assert_array_equal(fc1, sd["wn_mlp.0.weight"].numpy().T)
    # wn_mlp BN is live (bn1d) even under freeze_bn; HFRNorm declares a
    # RAW nn.BatchNorm named 'bn', so its tensors live at hfr/bn/* — an
    # earlier revision double-scoped them to hfr/bn/bn/* and silently
    # missed the model tree (caught by the randomized-BN golden)
    assert _leaf(out["params"], "hfr", "bn", "scale").shape == (C,)
    assert _leaf(out["batch_stats"], "hfr", "bn", "var").shape == (C,)
    np.testing.assert_allclose(_leaf(out["params"], "mlr", "p_mlr"), 0.5)


def test_full_checkpoint_load_into_state(mini_root, tmp_path):
    """End-to-end: save a torch .pth with reference prefixes, load into a
    live TrainState, verify a conv kernel landed (misc.py:165-178 parity)."""
    cfg = make_mini_cfg(mini_root, tmp_path)
    cfg.MODEL.NAME = "deeplabv3plus_resnettiny"
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DATA_PARALLEL = 1
    cfg.PROTOCOL = "source"
    learner = build_learner(cfg)

    k = np.asarray(learner.state.params["feature_extractor"]["conv1"]
                   ["kernel"])
    new_w = np.random.default_rng(0).normal(
        size=(64, 3, 7, 7)).astype(np.float32)
    sd = {"feature_extractor.backbone.conv1.weight": torch.from_numpy(new_w),
          "classifier.conv_seg.P_MLR": torch.ones(19, 16) * 0.125}
    p = str(tmp_path / "ref.pth")
    torch.save(sd, p)

    st = load_torch_module_params(learner.state, p, "feature_extractor")
    got = np.asarray(st.params["feature_extractor"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, new_w.transpose(2, 3, 1, 0))
    st = load_torch_module_params(st, p, "classifier")
    np.testing.assert_allclose(
        np.asarray(st.params["classifier"]["mlr"]["p_mlr"]), 0.125)


def test_deep_update_strict_rejects_unmatched_keys():
    """Strict merging must refuse to insert keys absent from the model
    tree (a wrong-backbone MODEL.WEIGHTS would otherwise corrupt the
    params pytree against the already-built opt_state)."""
    import pytest

    from halo_tpu.models.port_torch import _deep_update

    dst = {"a": {"w": np.zeros((2,))}}
    with pytest.raises(ValueError, match="no destination"):
        _deep_update(dst, {"a": {"w": np.ones(2), "nope": np.ones(3)}},
                     "m", strict=True)
    # non-strict keeps the permissive resume semantics
    dst2 = {"a": {"w": np.zeros((2,))}}
    _deep_update(dst2, {"a": {"extra": np.ones(3)}}, "m")
    assert "extra" in dst2["a"]


def test_load_rejects_checkpoint_with_no_matching_keys(tmp_path):
    """A checkpoint whose layout the importer doesn't recognize must be
    refused loudly, not silently leave the trunk at random init."""
    import pytest
    import torch

    from halo_tpu.engine.state import state_from_variables
    from halo_tpu.models.port_torch import load_torch_module_params

    path = str(tmp_path / "junk.pth")
    torch.save({"totally.unrelated.weight": torch.zeros(3)}, path)

    class _Tx:
        def init(self, params):
            return ()

    import jax.numpy as jnp
    variables = {"params": {"feature_extractor": {"conv1":
                 {"kernel": jnp.zeros((7, 7, 3, 64))}}}}
    state = state_from_variables(variables, _Tx())
    with pytest.raises(RuntimeError, match="no checkpoint keys matched"):
        load_torch_module_params(state, path, "feature_extractor")


def test_mit_importer_strips_mmseg_backbone_prefix():
    """mmseg-style SegFormer checkpoints prefix every key with
    'backbone.'; the MiT name map must still resolve them."""
    from halo_tpu.models.port_torch import _mit_torch_to_flax

    plain = _mit_torch_to_flax("patch_embed1.proj.weight")
    prefixed = _mit_torch_to_flax("backbone.patch_embed1.proj.weight")
    assert plain is not None
    assert prefixed == plain
