"""Programmatic quickstart: build, score, select — no CLI.

Run: python examples/quickstart.py
(uses random weights and random data; see README for real training)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from halo_tpu.config import get_default_cfg
from halo_tpu.models import build_segmentor
from halo_tpu.ops import hyperbolic as hyp
from halo_tpu.active import floating_region_score, select_pixels_to_label


def main():
    # 1. Flagship model: DeepLab-v3+/ResNet-101 with the Poincare head.
    cfg = get_default_cfg()
    cfg.MODEL.NAME = "deeplabv3plus_resnet101"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_segmentor(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 256, 512, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, train=False)

    # 2. Forward: logits + on-ball embedding.
    logits, embed = model.apply(variables, x, size=(256, 512), train=False)
    radius = hyp.dist0(embed.astype(jnp.float32), axis=-1)
    print("logits", logits.shape, "embedding", embed.shape,
          "mean hyperbolic radius %.3f" % float(radius.mean()))

    # 3. HALO acquisition: entropy x radius score, greedy region picks.
    embed_up = jax.image.resize(embed, (1, 256, 512, embed.shape[-1]),
                                "bilinear")
    score, _, _ = floating_region_score(
        logits[0], embed_up[0], unc_type="entropy", pur_type="radius",
        size=3, normalize=True)
    gt = jax.random.randint(jax.random.PRNGKey(3), (256, 512), 0, 19)
    res = select_pixels_to_label(
        score, jnp.full((256, 512), 255, jnp.int32), gt,
        jnp.zeros((256, 512), bool), jnp.zeros((256, 512), bool),
        num_picks=100, active_radius=1, mask_radius=5)
    print("picked", int(res.num_picked), "regions;",
          int(res.selected.sum()), "pixels labeled")


if __name__ == "__main__":
    main()
