"""Pallas greedy-selection kernel: the whole pick loop in VMEM.

The XLA fori_loop in selection.py is already ~1000x less work per pick than
the reference's serial host loop, but each iteration still pays XLA
loop/dispatch overhead and HBM round-trips for the column cache
(~30us/pick measured). This kernel keeps the ENTIRE score map (8 MB at
1024x2048 f32, within the ~16 MB VMEM budget), the column-max cache, and
the pick list resident in VMEM/SMEM and runs the full budget loop in one
kernel launch — per-pick cost is a cache argmax plus an aligned
(2m+1)-row block update.

Layout & alignment: the score map is transposed to (W, H) so a pick's
suppression window is a *sublane* slice; Mosaic requires dynamic sublane
offsets to be multiples of 8, so every dynamic access loads an 8-aligned
enclosing window and masks the (2m+1) interior columns with iota
comparisons. Tie-breaking matches the reference exactly (torch.max first
occurrence: smallest w, then smallest h — reference build.py:38-43) via
the iota-min trick. Picks stage through an 8-row register buffer and
flush to VMEM at 8-aligned offsets.

The mask/label replay stays in XLA (selection.py): it is block-sparse and
cheap, and keeping it out of the kernel leaves VMEM to the score map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")


def _align_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _maxrow(block):
    """Per-sublane (max, first-argmax-over-lanes) for a 2-D block."""
    bmax = jnp.max(block, axis=1, keepdims=True)              # (R, 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, block.shape, 1)
    brow = jnp.min(jnp.where(block == bmax, lanes, block.shape[1]),
                   axis=1, keepdims=True).astype(jnp.int32)   # (R, 1)
    return bmax, brow


def _select_kernel(score_t_ref, picks_ref, n_ref, scratch_ref,
                   colmax_ref, colrow_ref, *, num_picks: int,
                   mask_radius: int, h_dim: int, w_dim: int,
                   pad_l: int, rows_total: int, win: int):
    m = mask_radius
    mw = 2 * m + 1

    # ---- init: -inf rows everywhere, score at aligned offset pad_l ----
    scratch_ref[:, :] = jnp.full(scratch_ref.shape, _NEG_INF, jnp.float32)
    scratch_ref[pad_l:pad_l + w_dim, :] = score_t_ref[:, :]

    cmax, crow = _maxrow(scratch_ref[:, :])
    colmax_ref[:, :] = cmax
    colrow_ref[:, :] = crow

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows_total, 1), 0)
    win_rows = jax.lax.broadcasted_iota(jnp.int32, (win, h_dim), 0)
    win_lanes = jax.lax.broadcasted_iota(jnp.int32, (win, h_dim), 1)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 2), 0)

    def body(i, carry):
        buf, n_picked = carry
        # global argmax over interior columns (first occurrence).
        cm = colmax_ref[:, :]                                  # (R_t, 1)
        interior = (row_ids >= pad_l) & (row_ids < pad_l + w_dim)
        vals = jnp.where(interior, cm, _NEG_INF)
        maxval = jnp.max(vals)
        wp = jnp.min(jnp.where(vals == maxval, row_ids, rows_total)
                     ).astype(jnp.int32)                       # padded col
        hh = jnp.max(jnp.where(row_ids == wp, colrow_ref[:, :], 0))
        valid = maxval != _NEG_INF

        # aligned window covering padded cols [wp-m, wp+m].
        s = wp - m
        s_al = (s // 8) * 8
        block = scratch_ref[pl.ds(s_al, win), :]
        graw = s_al + win_rows                                  # global row
        col_hit = (graw >= s) & (graw < s + mw)
        lane_hit = jnp.abs(win_lanes - hh) <= m
        block = jnp.where(valid & col_hit & lane_hit, _NEG_INF, block)
        scratch_ref[pl.ds(s_al, win), :] = block

        bmax, brow = _maxrow(block)
        colmax_ref[pl.ds(s_al, win), :] = bmax
        colrow_ref[pl.ds(s_al, win), :] = brow

        # Stage picks in an 8-row register buffer; flush at 8-aligned
        # offsets (Mosaic requires 8-aligned dynamic sublane stores; SMEM
        # can't hold the pick list — ~256B padding per scalar).
        pick = jnp.where(valid,
                         jnp.stack([hh, wp - pad_l]).astype(jnp.int32),
                         jnp.full((2,), -1, jnp.int32))
        slot = jnp.mod(i, 8)
        buf = jnp.where(slot_ids == slot, pick[None, :], buf)

        @pl.when((slot == 7) | (i == num_picks - 1))
        def _():
            picks_ref[pl.ds((i // 8) * 8, 8), :] = buf

        return buf, n_picked + valid.astype(jnp.int32)

    init_buf = jnp.full((8, 2), -1, jnp.int32)
    _, n = jax.lax.fori_loop(0, num_picks, body,
                             (init_buf, jnp.int32(0)))
    n_ref[0, 0] = n


@functools.partial(jax.jit, static_argnames=("num_picks", "mask_radius",
                                             "interpret"))
def pallas_greedy_picks(score, *, num_picks: int, mask_radius: int,
                        interpret: bool = False):
    """Run the greedy pick loop on one (H, W) score map.

    Returns (picks (N, 2) int32 rows [h, w] with -1 padding, num_picked).
    The caller replays picks onto masks (selection.apply_picks).
    """
    h_dim, w_dim = score.shape
    score_t = score.astype(jnp.float32).T  # (W, H)
    m = mask_radius
    mw = 2 * m + 1

    pad_l = _align_up(m, 8)                 # aligned left margin >= m
    win = _align_up(mw + 7, 8)              # aligned window covers any offset
    rows_total = _align_up(pad_l + w_dim + m + win, 8)

    kernel = functools.partial(
        _select_kernel, num_picks=num_picks, mask_radius=m,
        h_dim=h_dim, w_dim=w_dim, pad_l=pad_l, rows_total=rows_total,
        win=win)

    picks, n = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((_align_up(num_picks, 8), 2), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows_total, h_dim), jnp.float32),
            pltpu.VMEM((rows_total, 1), jnp.float32),
            pltpu.VMEM((rows_total, 1), jnp.int32),
        ],
        interpret=interpret,
    )(score_t)
    return picks[:num_picks], n[0, 0]
