"""End-to-end train-step parity against the REAL reference stack.

Builds the reference's full source_target training step in torch — the
dilated ResNet-101 trunk + DepthwiseSeparableASPP_Hyper head
(core/models/), the CE + LocalConsistent + NegativeLearning loss sum
(core/train_learners.py:404-461), and the two-group SGD (backbone lr,
classifier lr x10; :167-208; RiemannianSGD degenerates to SGD because
P_MLR/A_MLR are plain Parameters — SURVEY.md §7) — on random weights and
one fixed batch, ports the weights into our flax model, and asserts that
halo_tpu's make_train_step reproduces

  * every logged loss component and the total,
  * the post-step PARAMETER UPDATE of every leaf (delta norms at f32
    tolerance against the reference's partially-f64 head),
  * the post-step BatchNorm running stats (the HFR BatchNorm1d sees the
    src and tgt forwards SEQUENTIALLY in torch; our _merge_stats must
    reconstruct exactly that semantics).

The layer-activation goldens (test_reference_golden.py) do not cover
optimizer/schedule/loss integration; this pins it.

Dropout is disabled on both sides (torch p=0, flax Dropout patched to
identity): the two frameworks cannot share dropout RNG, and parity of
the deterministic graph is the meaningful statement.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests import reference_shims

reference_shims.install()


@pytest.fixture(autouse=True)
def _no_dropout(monkeypatch):
    import flax.linen as fnn

    monkeypatch.setattr(
        fnn.Dropout, "__call__",
        lambda self, x, deterministic=None, rng=None: x)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=True)


def _build_reference(seed=0):
    from core.models import resnet as ref_resnet
    from core.models.classifier import DepthwiseSeparableASPP_Hyper
    from core.models.layers import FrozenBatchNorm2d
    from tests.test_reference_golden import _randomize_bn1d, _ref_cfg

    _ref_cfg(1.0)
    torch.manual_seed(seed)
    trunk = ref_resnet.resnet101(
        pretrained=False, pretrained_weights=None,
        replace_stride_with_dilation=[False, True, True],
        norm_layer=FrozenBatchNorm2d)
    gen = torch.Generator().manual_seed(1)
    for m in trunk.modules():
        if isinstance(m, FrozenBatchNorm2d):
            for name in ("weight", "bias", "running_mean"):
                getattr(m, name).normal_(0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)
    cls = DepthwiseSeparableASPP_Hyper(
        inplanes=2048, dilation_series=[1, 6, 12, 18],
        padding_series=[1, 6, 12, 18], num_classes=19,
        norm_layer=FrozenBatchNorm2d, reduced_channels=16, hfr=True)
    _randomize_bn1d(cls)
    for m in list(trunk.modules()) + list(cls.modules()):
        if isinstance(m, (torch.nn.Dropout, torch.nn.Dropout2d)):
            m.p = 0.0
    return trunk, cls


def _ref_forward(trunk, cls, x, size):
    """BaseLearner.forward (train_learners.py:52-55): tapped trunk feats
    ('low' = layer1, 'out' = layer4; feature_extractor.py:17-20) into the
    classifier with logits upsampled to the input size."""
    y = trunk.maxpool(torch.relu(trunk.bn1(trunk.conv1(x))))
    low = trunk.layer1(y)
    out = trunk.layer4(trunk.layer3(trunk.layer2(low)))
    return cls({"out": out, "low": low}, size=size)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v, np.float64)
    return out


def _port_into(variables, trunk_sd, cls_sd):
    from halo_tpu.models.port_torch import (_deep_update,
                                            torch_state_dict_to_variables)

    variables = jax.tree_util.tree_map(np.asarray, variables)
    conv_fe = torch_state_dict_to_variables(trunk_sd, "feature_extractor",
                                            freeze_bn=True)
    conv_cls = torch_state_dict_to_variables(
        cls_sd, "classifier", head="deeplabv3plus", freeze_bn=True)
    for conv, mod in ((conv_fe, "feature_extractor"),
                      (conv_cls, "classifier")):
        _deep_update(variables["params"][mod], conv["params"], "params")
        if conv["frozen"]:
            _deep_update(variables["frozen"][mod], conv["frozen"], "frozen")
        if conv["batch_stats"]:
            _deep_update(variables["batch_stats"][mod], conv["batch_stats"],
                         "stats")
    return variables


def test_reference_golden_source_target_train_step():
    from halo_tpu.config import get_default_cfg
    from halo_tpu.engine.optim import build_optimizer
    from halo_tpu.engine.state import state_from_variables
    from halo_tpu.engine.steps import make_train_step
    from halo_tpu.models import build_segmentor

    B, H, W = 2, 48, 64
    BASE_LR = 0.01

    trunk, cls = _build_reference()
    trunk.train()
    cls.train()

    rng = np.random.default_rng(0)
    src_img = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    tgt_img = rng.normal(size=(B, 3, H, W)).astype(np.float32)
    src_label = rng.integers(0, 19, size=(B, H, W)).astype(np.int64)
    src_label[:, :6, :] = 255
    tgt_mask = np.full((B, H, W), 255, np.int64)
    tgt_mask[:, 20:29, 10:25] = rng.integers(0, 19, size=(B, 9, 15))

    # ---- reference step (train_learners.py:404-461) -------------------
    from core.loss.negative_learning_loss import NegativeLearningLoss
    from core.loss.local_consistent_loss import LocalConsistentLoss

    criterion = torch.nn.CrossEntropyLoss(ignore_index=255)
    negative_criterion = NegativeLearningLoss(threshold=0.05)
    lcr = LocalConsistentLoss(19, "l1")
    LCR_W, NEG_W = 0.1, 1.0

    opt_fea = torch.optim.SGD(trunk.parameters(), lr=BASE_LR, momentum=0.9,
                              weight_decay=0.0005)
    opt_cls = torch.optim.SGD(cls.parameters(), lr=BASE_LR * 10,
                              momentum=0.9, weight_decay=0.0005)

    pre_trunk = {k: v.detach().clone() for k, v in
                 trunk.state_dict().items()}
    pre_cls = {k: v.detach().clone() for k, v in cls.state_dict().items()}

    opt_fea.zero_grad()
    opt_cls.zero_grad()
    src_out, _ = _ref_forward(trunk, cls, torch.from_numpy(src_img), (H, W))
    tgt_out, _ = _ref_forward(trunk, cls, torch.from_numpy(tgt_img), (H, W))
    predict = torch.softmax(tgt_out, dim=1)
    want = {}
    want["loss_sup"] = criterion(src_out, torch.from_numpy(src_label))
    loss = want["loss_sup"].clone()
    want["loss_sup_tgt"] = criterion(tgt_out, torch.from_numpy(tgt_mask))
    loss = loss + want["loss_sup_tgt"]
    want["consistency_loss"] = lcr(
        src_out, torch.from_numpy(src_label)) * LCR_W
    loss = loss + want["consistency_loss"]
    want["negative_loss"] = negative_criterion(predict) * NEG_W
    loss = loss + want["negative_loss"]
    want["loss"] = loss
    loss.backward()
    opt_fea.step()
    opt_cls.step()

    # ---- our step on the ported weights -------------------------------
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.MODEL.HYPER = True
    cfg.MODEL.HFR = True
    cfg.MODEL.REDUCED_CHANNELS = 16
    cfg.MODEL.FREEZE_BN = True
    cfg.MODEL.WEIGHTS = ""
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 0.0005
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.NUM_ITER = 100
    cfg.SOLVER.CONSISTENT_LOSS = LCR_W
    cfg.SOLVER.NEGATIVE_LOSS = NEG_W
    cfg.SOLVER.NEGATIVE_THRESHOLD = 0.05

    model = build_segmentor(cfg)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           dummy, train=False)
    variables = _port_into(variables, {k: v.numpy() for k, v in
                                       pre_trunk.items()},
                           {k: v.numpy() for k, v in pre_cls.items()})

    tx, _ = build_optimizer(cfg, num_devices=1)
    state = state_from_variables(variables, tx)
    pre_params = _flatten(jax.tree_util.tree_map(np.asarray, state.params))
    pre_stats = _flatten(jax.tree_util.tree_map(np.asarray,
                                                state.batch_stats))

    step = make_train_step(cfg, model, tx, "source_target")
    batches = {
        "source": {"img": jnp.asarray(np.transpose(src_img, (0, 2, 3, 1))),
                   "label": jnp.asarray(src_label.astype(np.int32))},
        "target": {"img": jnp.asarray(np.transpose(tgt_img, (0, 2, 3, 1))),
                   "mask": jnp.asarray(tgt_mask.astype(np.int32))},
    }
    state, metrics = step(state, batches, jax.random.PRNGKey(2))

    # ---- loss components ---------------------------------------------
    for name, val in want.items():
        got = float(metrics[name])
        np.testing.assert_allclose(got, float(val), rtol=5e-3, atol=1e-4,
                                   err_msg=name)

    # ---- post-step parameter deltas ----------------------------------
    from halo_tpu.models.port_torch import (_deep_update,
                                            torch_state_dict_to_variables)

    post_ref = jax.tree_util.tree_map(np.asarray, variables)
    for sd, mod in (({k: v.detach().numpy() for k, v in
                      trunk.state_dict().items()}, "feature_extractor"),
                    ({k: v.detach().numpy() for k, v in
                      cls.state_dict().items()}, "classifier")):
        conv = torch_state_dict_to_variables(
            sd, mod, head="deeplabv3plus", freeze_bn=True)
        _deep_update(post_ref["params"][mod], conv["params"], "params")
        if conv["batch_stats"]:
            _deep_update(post_ref["batch_stats"][mod], conv["batch_stats"],
                         "stats")

    want_post = _flatten(post_ref["params"])
    got_post = _flatten(jax.tree_util.tree_map(np.asarray, state.params))
    assert want_post.keys() == got_post.keys()
    bad = []
    for k in want_post:
        d_ref = want_post[k] - pre_params[k]
        d_got = got_post[k] - pre_params[k]
        scale = np.linalg.norm(d_ref)
        err = np.linalg.norm(d_got - d_ref)
        # lr*wd alone moves every leaf, so scale is never ~0; the 3%
        # envelope absorbs the reference head's f64-vs-f32 difference
        assert scale > 0, k
        if err / scale > 3e-2:
            bad.append((k, err / scale))
    assert not bad, f"param-update divergence: {bad}"

    # ---- sequential BN running-stats semantics ------------------------
    want_stats = _flatten(post_ref["batch_stats"])
    got_stats = _flatten(jax.tree_util.tree_map(np.asarray,
                                                state.batch_stats))
    assert want_stats.keys() == got_stats.keys() and want_stats
    for k in want_stats:
        d_ref = want_stats[k] - pre_stats[k]
        d_got = got_stats[k] - pre_stats[k]
        np.testing.assert_allclose(
            d_got, d_ref, rtol=2e-2, atol=1e-5,
            err_msg=f"running-stat update {k}")
