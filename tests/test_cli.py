"""CLI surface tests: the ``-cfg PATH [KEY VALUE ...]`` contract
(reference: core/utils/misc.py:137-162)."""

import os

import pytest

from halo_tpu.config import get_default_cfg
from halo_tpu.utils.misc import parse_args


def test_parse_args_merges_yaml_and_overrides(tmp_path):
    yaml = tmp_path / "c.yaml"
    yaml.write_text(
        "MODEL:\n  NAME: 'deeplabv2_resnet101'\n  HYPER: False\n"
        "SOLVER:\n  BASE_LR: 0.01\nNAME: 'exp1'\nOUTPUT_DIR: 'out'\n")
    cfg = get_default_cfg()
    parse_args(argv=["-cfg", str(yaml),
                     "SOLVER.BASE_LR", "0.5",
                     "MODEL.HYPER", "True",
                     "ACTIVE.SELECT_ITER", "[0, 10]"], cfg=cfg)
    assert cfg.MODEL.NAME == "deeplabv2_resnet101"
    assert cfg.MODEL.HYPER is True            # CLI beats YAML
    assert cfg.SOLVER.BASE_LR == 0.5
    assert list(cfg.ACTIVE.SELECT_ITER) == [0, 10]
    # SAVE_DIR = OUTPUT_DIR/NAME (reference misc.py:158)
    assert cfg.SAVE_DIR == os.path.join("out", "exp1")
    assert cfg.is_frozen()


def test_parse_args_trailing_newline_override(tmp_path):
    """The reference strips a trailing CR/LF from the last override
    (misc.py:150-151)."""
    yaml = tmp_path / "c.yaml"
    yaml.write_text("NAME: 'x'\n")
    cfg = get_default_cfg()
    parse_args(argv=["-cfg", str(yaml), "NAME", "fromcli\r\n"], cfg=cfg)
    assert cfg.NAME == "fromcli"


def test_frozen_cfg_rejects_mutation(tmp_path):
    yaml = tmp_path / "c.yaml"
    yaml.write_text("NAME: 'x'\n")
    cfg = get_default_cfg()
    parse_args(argv=["-cfg", str(yaml)], cfg=cfg)
    with pytest.raises(Exception):
        cfg.NAME = "nope"
