"""Tests for the yacs-compatible config system (reference CLI surface:
train.py -cfg PATH [KEY VALUE ...], core/utils/misc.py:137-162)."""

import os

import pytest

from halo_tpu.config import get_default_cfg
from halo_tpu.config.node import CfgNode


def test_defaults_schema_keys():
    cfg = get_default_cfg()
    # the reference schema keys (core/configs/defaults.py:5-99)
    assert cfg.MODEL.NAME == "deeplabv3plus_resnet101"
    assert cfg.MODEL.NUM_CLASSES == 19
    assert cfg.MODEL.HYPER is True
    assert cfg.MODEL.CURVATURE == 1.0
    assert cfg.MODEL.REDUCED_CHANNELS == 64
    assert cfg.ACTIVE.SELECT_ITER == [0, 15000, 30000, 40000, 50000]
    assert cfg.ACTIVE.BUDGET == 0.05
    assert cfg.SOLVER.BASE_LR == 1e-3
    assert cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN == (1280, 720)
    assert cfg.PROTOCOL == "source_target"


def test_merge_from_list_and_freeze():
    cfg = get_default_cfg()
    cfg.merge_from_list(["SOLVER.BASE_LR", "0.01", "MODEL.HYPER", "False",
                         "NAME", "exp1"])
    assert cfg.SOLVER.BASE_LR == 0.01
    assert cfg.MODEL.HYPER is False
    assert cfg.NAME == "exp1"
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.NAME = "other"
    cfg.defrost()
    cfg.NAME = "other"
    assert cfg.NAME == "other"


def test_merge_from_file(tmp_path):
    yaml_text = """
MODEL:
  NAME: "deeplabv2_resnet101"   # comment
  HYPER: True
  REDUCED_CHANNELS: 64
INPUT:
  SOURCE_INPUT_SIZE_TRAIN: (1280, 720)
SOLVER:
  GPUS: [0,1]
  BASE_LR: 1e-3
ACTIVE:
  SELECT_ITER: [0, 15000]
  UNCERTAINTY: 'entropy'
  PURITY: 'radius'
NAME: 'test_run'
PROTOCOL: 'source_free'
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    cfg = get_default_cfg()
    cfg.set_new_allowed(True)
    cfg.merge_from_file(str(p))
    assert cfg.MODEL.NAME == "deeplabv2_resnet101"
    assert cfg.INPUT.SOURCE_INPUT_SIZE_TRAIN == (1280, 720)
    assert cfg.SOLVER.GPUS == [0, 1]
    assert cfg.SOLVER.BASE_LR == 1e-3
    assert cfg.ACTIVE.SELECT_ITER == [0, 15000]
    assert cfg.ACTIVE.PURITY == "radius"
    assert cfg.PROTOCOL == "source_free"


def test_new_keys_allowed_like_reference_recipes(tmp_path):
    """The shipped recipes add keys beyond the schema (e.g. ACTIVE.RATIO);
    the reference enables set_new_allowed before merging (misc.py:155)."""
    p = tmp_path / "cfg.yaml"
    p.write_text("ACTIVE:\n  RATIO: 0.05\n")
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_file(str(p))
    cfg.set_new_allowed(True)
    cfg.merge_from_file(str(p))
    assert cfg.ACTIVE.RATIO == 0.05


def test_clone_is_independent():
    cfg = get_default_cfg()
    c2 = cfg.clone()
    c2.NAME = "x"
    assert cfg.NAME != "x"


def test_mini_yaml_parser_matches_pyyaml():
    """The fallback parser must agree with PyYAML after value decoding
    (PyYAML keeps '(1280, 720)' a string; both decode to tuples on merge)."""
    from halo_tpu.config.node import _MiniYaml, _decode_value
    import yaml

    def decode(tree):
        if isinstance(tree, dict):
            return {k: decode(v) for k, v in tree.items()}
        return _decode_value(tree)

    text = open(os.path.join(os.path.dirname(__file__), "..",
                             "configs", "gtav", "source_target.yaml")).read()
    assert decode(_MiniYaml(text).parse()) == decode(yaml.safe_load(text))
