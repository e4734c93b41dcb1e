"""Active-learning round: sweep the target set, score, select, persist.

Re-implements RegionSelection (reference: core/active/build.py:71-186): for
every target image, forward in eval mode, upsample logits (+ Poincare
embedding when the scoring needs it) to native resolution, compute the
region score, mask out already-active pixels, pick
ceil(H*W*budget_round/(2r+1)^2) regions greedily, and persist the updated
mask PNG + indicator file that the training dataloaders lazily re-read.

TPU-native structure versus the reference's ~2.3k serial GPU argmax
round-trips per image (SURVEY.md §3C):
  * forwards run TPU.ACTIVE_BATCH images per dispatch (identical masks to
    the reference's batch=1 sweep, core/train_learners.py:282-289);
  * scoring + greedy selection are two compiled programs per map shape
    (the selection loop is a VMEM-resident Pallas kernel on TPU);
  * mask/indicator PNG encode + file IO run on background threads,
    overlapped with the next batch's device work.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data import mask_cache
from ..data.masks import save_indicator, save_mask_png
from ..engine.steps import make_forward
from ..ops.resize import resize_bilinear
from .scoring import floating_region_score
from .selection import pallas_select_pixels_to_label, select_pixels_to_label


def region_selection(cfg, model, state, active_loader, round_number: int,
                     progress: bool = True):
    """Run one acquisition round over ``active_loader``."""
    per_region_pixels = (2 * cfg.ACTIVE.RADIUS_K + 1) ** 2
    active_radius = cfg.ACTIVE.RADIUS_K
    mask_radius = cfg.ACTIVE.MASK_RADIUS_K
    budget_round = cfg.ACTIVE.BUDGET / len(cfg.ACTIVE.SELECT_ITER)
    unc_type = cfg.ACTIVE.UNCERTAINTY
    pur_type = cfg.ACTIVE.PURITY
    normalize = bool(cfg.ACTIVE.NORMALIZE)
    K = cfg.ACTIVE.K
    num_classes = cfg.MODEL.NUM_CLASSES
    curvature = float(cfg.MODEL.CURVATURE)

    needs_embed = (pur_type in ("hyper", "radius", "euc_norm")
                   or unc_type in ("certainty", "hyperbolic")
                   or (unc_type == "none" and cfg.MODEL.HYPER))

    forward = make_forward(model)

    @partial(jax.jit, static_argnums=(3,))
    def fwd_and_score(variables, img, gt_b, size):
        """Forward + native-res upsample + per-image region score in ONE
        program: the (H, W, 19+64) native-res maps never round-trip to
        HBM between dispatches (reference splits these steps,
        build.py:110-144)."""
        out, aux = forward(variables, img, False)
        out = resize_bilinear(out.astype(jnp.float32), size)
        if needs_embed and aux is not None:
            aux = resize_bilinear(aux.astype(jnp.float32), size)
        scores = []
        for b in range(img.shape[0]):  # unrolled at trace time
            s_b, _, _ = floating_region_score(
                out[b], aux[b] if aux is not None else None, gt_b[b],
                unc_type=unc_type, pur_type=pur_type,
                size=2 * active_radius + 1, num_classes=num_classes, K=K,
                normalize=normalize, c=curvature)
            scores.append(s_b)
        return jnp.stack(scores)

    use_pallas = (bool(getattr(cfg.TPU, "PALLAS_SELECTION", True))
                  and jax.default_backend() == "tpu")
    select = (pallas_select_pixels_to_label if use_pallas
              else select_pixels_to_label)

    variables = state.variables()
    stats = {"images": 0, "picked": 0, "labeled_px": 0}
    io_pool = ThreadPoolExecutor(max_workers=4)

    def _persist(mask, active_arr, selected_arr, mask_path, ind_path):
        save_mask_png(mask.astype(np.uint8), mask_path)
        save_indicator({"active": active_arr, "selected": selected_arr},
                       ind_path)

    viz_list = []
    if cfg.ACTIVE.VIZ_MASK:
        # 20 fixed pseudo-random image indices (reference: build.py:23-24)
        viz_list = list(np.random.RandomState(
            max(cfg.SEED, 0) + 1).randint(0, 500, 20))

    def _viz(i, b, batch, imgs, size, score, res):
        if not (cfg.ACTIVE.VIZ_MASK and i in viz_list):
            return
        from ..utils.visualize import denormalize_image, visualization_plots
        img_native = np.asarray(
            resize_bilinear(imgs[b].astype(jnp.float32), size))
        mean = np.asarray(cfg.INPUT.PIXEL_MEAN) * 255.0
        std = np.asarray(cfg.INPUT.PIXEL_STD) * 255.0
        visualization_plots(
            denormalize_image(img_native, mean, std),
            np.asarray(score), np.asarray(res.active_mask),
            round_number, batch["name"][b], cfg.SAVE_DIR,
            uncertainty=unc_type, purity=pur_type)

    img_index = 0
    for batch in iter(active_loader):
        # One forward per dispatch covers the whole mini-batch; scoring +
        # selection then run per image (identical masks to batch=1).
        imgs = jnp.asarray(batch["img"])
        size = tuple(int(s) for s in batch["size"][0])
        gt_b = jnp.asarray(batch["origin_label"])
        scores = fwd_and_score(variables, imgs, gt_b, size)

        for b in range(imgs.shape[0]):
            i = img_index
            img_index += 1
            gt = gt_b[b]
            active_mask = jnp.asarray(batch["origin_mask"][b])
            active = jnp.asarray(batch["active"][b])
            selected = jnp.asarray(batch["selected"][b])
            score = scores[b]

            num_pixels = size[0] * size[1]
            active_regions = math.ceil(
                num_pixels * budget_round / per_region_pixels)

            res = select(
                score, active_mask, gt, active, selected,
                num_picks=active_regions, active_radius=active_radius,
                mask_radius=mask_radius)

            # ONE device->host transfer for all outputs (each np.asarray
            # would be its own blocking sync; at 2975 images/round the
            # extra round-trips dominate). Publish in-process immediately
            # (single-host fast path), then persist off-thread so PNG
            # encode + file IO overlap the next image's device work (the
            # reference serializes all of this, build.py:162-166).
            mask_np, active_np, selected_np, n_picked = jax.device_get(
                (res.active_mask, res.active, res.selected,
                 res.num_picked))
            mask_np = mask_np.astype(np.uint8)
            mask_cache.put_mask(batch["path_to_mask"][b], mask_np)
            mask_cache.put_indicator(batch["path_to_indicator"][b],
                                     {"active": active_np,
                                      "selected": selected_np})
            io_pool.submit(_persist, mask_np, active_np, selected_np,
                           batch["path_to_mask"][b],
                           batch["path_to_indicator"][b])

            stats["images"] += 1
            stats["picked"] += int(n_picked)
            stats["labeled_px"] += int(selected_np.sum())

            _viz(i, b, batch, imgs, size, score, res)
            if progress and (i + 1) % 200 == 0:
                print(f"  [round {round_number}] {i + 1} images scored")

    io_pool.shutdown(wait=True)  # all masks durable before training resumes
    return stats
