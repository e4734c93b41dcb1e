"""Smoke tests for the matplotlib visualization tooling (C22)."""

import os

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")

from halo_tpu.utils.visualize import (denormalize_image, visualization_plots,
                                      visualize_wrong)


def test_visualization_plots_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
    score = rng.random((32, 64)).astype(np.float32)
    mask = np.full((32, 64), 255, np.uint8)
    mask[10:13, 20:23] = 5
    out = visualization_plots(img, score, mask, round_number=1,
                              name="city0/city0_000_x.png",
                              save_dir=str(tmp_path))
    assert os.path.exists(out) and out.endswith("_round1.png")


def test_visualize_wrong_writes_png(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
    pred = rng.integers(0, 19, (32, 64))
    label = rng.integers(0, 19, (32, 64))
    label[:4] = 255
    ent = rng.random((32, 64))
    rad = rng.random((32, 64))
    p = str(tmp_path / "viz" / "wrong" / "x.png")
    out = visualize_wrong(img, pred, label, ent, rad, ent * rad, p)
    assert os.path.exists(out)


def test_denormalize_roundtrip():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 255, (8, 8, 3)).astype(np.float64)
    from halo_tpu.utils.visualize import CITYSCAPES_MEAN, CITYSCAPES_STD
    normed = (raw - CITYSCAPES_MEAN) / CITYSCAPES_STD
    back = denormalize_image(normed)
    np.testing.assert_allclose(back, raw, atol=1.0)
