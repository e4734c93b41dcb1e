"""Active-learning round: sweep the target set, score, select, persist.

Re-implements RegionSelection (reference: core/active/build.py:71-186): for
every target image, forward in eval mode, upsample logits (+ Poincare
embedding when the scoring needs it) to native resolution, compute the
region score, mask out already-active pixels, pick
ceil(H*W*budget_round/(2r+1)^2) regions greedily, and persist the updated
mask PNG + indicator file that the training dataloaders lazily re-read.

TPU-native structure versus the reference's rank-0-only, batch=1 sweep with
~2.3k serial GPU argmax round-trips per image (SURVEY.md §3C):

  * the whole per-image pipeline — forward, native-res upsample, region
    score, greedy selection — is ONE compiled program per dispatch,
    shard_map'd over the ``data`` mesh axis: every chip processes
    TPU.ACTIVE_BATCH images per dispatch, so an n-chip mesh divides the
    round wall-clock by n (SURVEY.md §5 names this the TPU-native scaling
    lever; masks are bit-identical to the single-device sweep because each
    image's compute is independent);
  * greedy selection runs in-program (the VMEM-resident Pallas kernel on
    TPU, the XLA column-cache loop elsewhere) — score maps never leave
    the chip;
  * each process persists only the images its devices own (disjoint
    writers, no races — multi-host sound by construction; the reference
    serializes everything on rank 0, core/train_learners.py:307-326);
  * mask/indicator PNG encode + file IO run on background threads,
    overlapped with the next batch's device work.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..data import mask_cache
from ..data.masks import save_indicator, save_mask_png
from ..engine.steps import make_forward
from ..ops.resize import resize_bilinear
from ..parallel import multihost
from ..parallel.mesh import batch_sharding
from .scoring import floating_region_score, fused_upsample_region_score
from .selection import pallas_select_pixels_to_label, select_pixels_to_label

# Compiled fwd+score+select programs, shared across rounds of a run
# (keyed on model identity + mesh + every trace-time option). Bounded:
# each cached closure retains its model + compiled executable, so an
# unbounded dict would pin every Learner ever built in this process
# (notebooks, long test sessions). LRU-evicting at _PROGRAM_CACHE_MAX
# keeps the cross-round reuse (a run needs a handful of signatures)
# while letting stale models die.
_PROGRAM_CACHE: dict = {}
_PROGRAM_CACHE_MAX = 32


def _local_rows(garr) -> np.ndarray:
    """This process's addressable rows of a batch-sharded global array, in
    global row order. Single-host (or fully-replicated): all rows. The
    result lines up 1:1 with the host's loader slice because both the
    loader shard and the mesh assign contiguous blocks per process."""
    rows = {}
    for s in garr.addressable_shards:
        sl = s.index[0] if s.index else slice(None)
        start = 0 if sl.start is None else int(sl.start)
        data = np.asarray(s.data)
        for j in range(data.shape[0]):
            rows[start + j] = data[j]
    return np.stack([rows[k] for k in sorted(rows)])


def region_selection(cfg, model, state, active_loader, round_number: int,
                     progress: bool = True, mesh=None):
    """Run one acquisition round over ``active_loader``.

    ``mesh``: optional jax Mesh; with a >1 ``data`` axis the sweep is
    sharded over it (one image-batch shard per device). None or a 1-device
    mesh reproduce the single-chip sweep program exactly.
    """
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

    # 'random' is an EXTENSION (the reference has no random baseline in
    # code): score = per-image seeded uniform noise, purity ignored — the
    # equal-budget control arm for acquisition-quality comparisons
    # (benchmarks/acquisition_quality.py, the paper's HALO-vs-RAND
    # ablation). Deterministic in (cfg.SEED, round, global image index),
    # so every host computes identical masks.
    random_score = unc_type == "random"

    needs_embed = (not random_score
                   and (pur_type in ("hyper", "radius", "euc_norm")
                        or unc_type in ("certainty", "hyperbolic")
                        or (unc_type == "none" and cfg.MODEL.HYPER)))

    # Native-res map dtype for the bandwidth-bound score chain; the
    # scoring ops upcast to f32 in-register, so bf16 maps halve the HBM
    # traffic without f32 accumulation loss (TPU.SCORING_DTYPE).
    score_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
        str(getattr(cfg.TPU, "SCORING_DTYPE", "bfloat16"))]
    want_score = bool(cfg.ACTIVE.VIZ_MASK)  # score map fetched for plots

    forward = make_forward(model)

    use_fused = bool(getattr(cfg.TPU, "FUSED_UPSAMPLE", True))
    use_pallas = (bool(getattr(cfg.TPU, "PALLAS_SELECTION", True))
                  and jax.default_backend() == "tpu")
    select = (pallas_select_pixels_to_label if use_pallas
              else select_pixels_to_label)

    n_data = mesh.shape["data"] if mesh is not None else 1

    def get_program(size, global_batch, num_picks):
        """One compiled fwd+score+select program per (native size, batch)
        signature; sharded over the data axis when the mesh has one.
        Cached at module level so SUBSEQUENT ROUNDS of the same run reuse
        the compiled program instead of paying a fresh XLA compile per
        round (minutes each through this environment's compile relay)."""
        key = (id(model), mesh, size, global_batch, num_picks, want_score,
               unc_type,
               pur_type, normalize, K, num_classes, curvature,
               active_radius, mask_radius, needs_embed, use_pallas,
               use_fused, str(score_dtype))
        if key in _PROGRAM_CACHE:
            _PROGRAM_CACHE[key] = _PROGRAM_CACHE.pop(key)  # LRU touch
            return _PROGRAM_CACHE[key]
        local = global_batch // n_data

        def body(variables, img, gt, mask, active, selected, seeds):
            # transfer-dtype discipline: labels/masks arrive uint8 and
            # images arrive in the compute dtype (see _put_batch) — a
            # 2975-image sweep moves ~3x less over PCIe/DCN (and this dev
            # environment's relay). Upcast on device; exact.
            gt = gt.astype(jnp.int32)
            mask = mask.astype(jnp.int32)
            if random_score:
                out = aux = None  # no forward: the control arm needs no
                # model signal, only the same selector at the same budget
            else:
                out, aux = forward(variables, img, False)
            gt_needed = (unc_type == "oracle_acc"
                         or pur_type == "oracle_ripu")
            if not use_fused and not random_score:
                out = resize_bilinear(out.astype(jnp.float32), size)
                out = out.astype(score_dtype)
                if needs_embed and aux is not None:
                    aux = resize_bilinear(aux.astype(jnp.float32), size)
                    aux = aux.astype(score_dtype)
            fields = []
            for b in range(local):  # unrolled at trace time
                if random_score:
                    score = jax.random.uniform(
                        jax.random.PRNGKey(seeds[b]), size, jnp.float32)
                elif use_fused:
                    # native logits/embedding never materialize: the
                    # upsample is folded into the per-pixel score stage
                    # (fused_upsample_region_score; ULP-equal maps,
                    # bit-equal masks)
                    native_size = size  # (H, W); `size=` below is the
                    # (2r+1) score window — two unrelated meanings
                    score, _, _ = fused_upsample_region_score(
                        out[b],
                        (aux[b] if (needs_embed and aux is not None)
                         else None),
                        native_size, gt[b] if gt_needed else None,
                        score_dtype=score_dtype, unc_type=unc_type,
                        pur_type=pur_type, size=2 * active_radius + 1,
                        num_classes=num_classes, K=K,
                        normalize=normalize, c=curvature)
                else:
                    score, _, _ = floating_region_score(
                        out[b], aux[b] if aux is not None else None,
                        gt[b],
                        unc_type=unc_type, pur_type=pur_type,
                        size=2 * active_radius + 1,
                        num_classes=num_classes,
                        K=K, normalize=normalize, c=curvature)
                res = select(
                    score, mask[b], gt[b], active[b], selected[b],
                    num_picks=num_picks, active_radius=active_radius,
                    mask_radius=mask_radius)
                row = (res.active_mask.astype(jnp.uint8), res.active,
                       res.selected, res.num_picked)
                # the full (H,W) f32 score map is a program OUTPUT only
                # when viz needs it — an output can't be DCE'd, and with
                # viz off it would cost an extra 8 MB HBM write per image
                fields.append((score,) + row if want_score else row)
            n_out = 5 if want_score else 4
            return tuple(jnp.stack([f[i] for f in fields])
                         for i in range(n_out))

        if mesh is not None and n_data > 1:
            fn = jax.shard_map(
                body, mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                          P("data"), P("data")),
                out_specs=(P("data"),) * (5 if want_score else 4),
                check_vma=False)
        else:
            fn = body
        while len(_PROGRAM_CACHE) >= _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
        _PROGRAM_CACHE[key] = jax.jit(fn)
        return _PROGRAM_CACHE[key]

    sh = batch_sharding(mesh) if mesh is not None else None

    compute_bf16 = str(getattr(cfg.TPU, "COMPUTE_DTYPE",
                               "float32")) == "bfloat16"

    def put(a, transfer_dtype=None):
        """Host->device with transfer-dtype discipline. ``uint8`` for
        label/mask fields (values in [0,255], exact) and host-side bf16
        for images when the model computes in bf16 (the first conv casts
        f32->bf16 anyway, so this is bit-identical) — the sweep's
        transfers shrink ~3x, which matters for the 2975-image round on
        PCIe/DCN and dominates wall-clock through this dev relay."""
        a = np.asarray(a)
        if transfer_dtype is not None:
            a = a.astype(transfer_dtype)
        if mesh is None:
            return jnp.asarray(a)
        return multihost.make_global_array(a, sh)

    if compute_bf16:
        import ml_dtypes
        img_dtype = ml_dtypes.bfloat16
    else:
        img_dtype = None

    variables = state.variables()
    stats = {"images": 0, "picked": 0, "labeled_px": 0}
    io_pool = ThreadPoolExecutor(max_workers=4)
    io_futures = []

    def _persist(mask, active_arr, selected_arr, mask_path, ind_path):
        save_mask_png(mask.astype(np.uint8), mask_path)
        save_indicator({"active": active_arr, "selected": selected_arr},
                       ind_path)

    viz_list = []
    if cfg.ACTIVE.VIZ_MASK:
        # 20 fixed pseudo-random image indices (reference: build.py:23-24)
        viz_list = list(np.random.RandomState(
            max(cfg.SEED, 0) + 1).randint(0, 500, 20))

    def _viz(gidx, b, batch, imgs, size, score, active_mask):
        if not (cfg.ACTIVE.VIZ_MASK and gidx in viz_list):
            return
        from ..utils.visualize import denormalize_image, visualization_plots
        img_native = np.asarray(
            resize_bilinear(jnp.asarray(imgs[b], jnp.float32), size))
        mean = np.asarray(cfg.INPUT.PIXEL_MEAN) * 255.0
        std = np.asarray(cfg.INPUT.PIXEL_STD) * 255.0
        visualization_plots(
            denormalize_image(img_native, mean, std),
            score, active_mask,
            round_number, batch["name"][b], cfg.SAVE_DIR,
            uncertainty=unc_type, purity=pur_type)

    # Global-batch bookkeeping: the loader yields this process's local
    # slice; global image index = batch_no*global_batch + shard offset + b.
    global_batch = active_loader.batch_size
    shard = getattr(active_loader, "shard", None)
    shard_offset = (shard[0] * (global_batch // shard[1])) if shard else 0

    local_batch = global_batch // (shard[1] if shard else 1)
    for batch_no, batch in enumerate(iter(active_loader)):
        imgs = np.asarray(batch["img"])
        if imgs.shape[0] != local_batch:
            raise ValueError(
                f"active_loader yielded a {imgs.shape[0]}-row batch but "
                f"the fused program is traced for {local_batch} rows per "
                "process — build the loader with pad_final=True (the "
                "learner does) so trailing partial batches are padded.")
        sizes = np.asarray(batch["size"])
        if not (sizes == sizes[0]).all():
            raise ValueError(
                f"batch mixes native sizes {sizes.tolist()}; the fused "
                "program scores the whole batch at one resolution — build "
                "the loader with group_by_size=True (the learner does for "
                "ACTIVE_BATCH > 1; the reference handles size per-image "
                "at batch 1, build.py:118-126)")
        size = tuple(int(s) for s in sizes[0])
        is_pad = np.asarray(batch.get("is_pad",
                                      np.zeros(imgs.shape[0], bool)))

        num_pixels = size[0] * size[1]
        active_regions = math.ceil(
            num_pixels * budget_round / per_region_pixels)

        # Per-image PRNG seeds for the 'random' control arm: a fixed
        # integer mix of (cfg.SEED, round, GLOBAL image index), so masks
        # are deterministic and identical across hosts/mesh layouts.
        # Unused (traced away) by every model-scored mode.
        seeds = np.array(
            [(max(cfg.SEED, 0) * 2654435761
              + round_number * 40503
              + (batch_no * global_batch + shard_offset + b) * 2246822519)
             & 0x7FFFFFFF for b in range(imgs.shape[0])], np.uint32)

        prog = get_program(size, global_batch, active_regions)
        # The random control arm never reads the images (its program has
        # no forward) — don't pay the dominant host->device image
        # transfer for data XLA traces away; a 1x1 dummy keeps the
        # argument arity/sharding identical.
        img_arg = (put(np.zeros((imgs.shape[0], 1, 1, 1), np.uint8))
                   if random_score else put(imgs, img_dtype))
        outs = prog(
            variables, img_arg,
            put(batch["origin_label"], np.uint8),
            put(batch["origin_mask"], np.uint8), put(batch["active"]),
            put(batch["selected"]), put(seeds))
        score_s = outs[0] if want_score else None
        mask_s, active_s, selected_s, picked_s = outs[-4:]

        # Fetch only this process's shards (one transfer per array per
        # dispatch); rows line up with the local loader slice. The mask
        # comes back uint8 straight from the program.
        mask_np = _local_rows(mask_s)
        active_np = _local_rows(active_s)
        selected_np = _local_rows(selected_s)
        picked_np = _local_rows(picked_s)
        score_np = _local_rows(score_s) if want_score else None

        for b in range(imgs.shape[0]):
            if is_pad[b]:
                continue
            gidx = batch_no * global_batch + shard_offset + b
            # Publish in-process immediately (single-host fast path), then
            # persist off-thread so PNG encode + file IO overlap the next
            # batch's device work (the reference serializes all of this,
            # build.py:162-166).
            mask_cache.put_mask(batch["path_to_mask"][b], mask_np[b])
            mask_cache.put_indicator(batch["path_to_indicator"][b],
                                     {"active": active_np[b],
                                      "selected": selected_np[b]})
            io_futures.append(io_pool.submit(
                _persist, mask_np[b], active_np[b], selected_np[b],
                batch["path_to_mask"][b], batch["path_to_indicator"][b]))

            stats["images"] += 1
            stats["picked"] += int(picked_np[b])
            # THIS round's labeling: the selected indicator accumulates
            # across rounds, so subtract what came in with the batch
            stats["labeled_px"] += (int(selected_np[b].sum())
                                    - int(np.asarray(
                                        batch["selected"][b]).sum()))

            if score_np is not None:
                _viz(gidx, b, batch, imgs, size, score_np[b], mask_np[b])
            if progress and stats["images"] % 200 == 0:
                print(f"  [round {round_number}] {stats['images']} "
                      f"images scored")

    io_pool.shutdown(wait=True)  # all masks durable before training resumes
    for f in io_futures:
        f.result()  # surface persist failures — a silently missing mask
        # PNG would poison any restart or other-host read
    return stats
