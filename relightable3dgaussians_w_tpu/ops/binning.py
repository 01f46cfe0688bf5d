"""Tile binning: duplicate expansion, (tile, depth) sort, per-tile ranges.

TPU-native re-design of the reference's CUB pipeline (`duplicateWithKeys` +
`DeviceRadixSort` + `identifyTileRanges`, cuda_rasterizer/rasterizer_impl.cu:70-138,
198-336). The CUDA code sizes its key buffer from a device->host read of the scanned
duplicate count; XLA requires static shapes, so this version uses a *static total
entry budget* (`max_dup`) and reports overflow counters instead of resizing —
correctness degrades loudly (SURVEY.md §7 "Hard parts").

Entry expansion is budget-proportional, not N*K: each of the `max_dup` entry slots
finds its source Gaussian via scatter-marks on the exclusive-cumsum offsets + a
cummax forward fill (O(max_dup), no per-Gaussian tile cap — a Gaussian may overlap
arbitrarily many tiles, like the reference).

Sorting packs (tile, depth-rank) into ONE uint32 key when the bit budget allows
(tile_bits + ceil(log2 N) <= 32): Gaussians are pre-ranked by a stable depth argsort,
which reproduces the reference's [tileID||float-depth-bits] 64-bit radix order
exactly for the positive depths that survive the near cull (ties resolved by
Gaussian index, as CUB's stable radix sort does). Otherwise falls back to a
two-key lexicographic sort.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import PreprocessOut


class BinningOut(NamedTuple):
    gauss_id: jnp.ndarray    # [max_dup] int32 source Gaussian per sorted entry
    tile_id: jnp.ndarray     # [max_dup] int32 tile per sorted entry (sentinel = num_tiles for padding)
    tile_start: jnp.ndarray  # [num_tiles] int32 first entry of each tile
    tile_end: jnp.ndarray    # [num_tiles] int32 one-past-last entry of each tile
    num_entries: jnp.ndarray # [] int32 valid entries (before budget clamp)
    overflow: jnp.ndarray    # [] int32: entries dropped by the budget (0 = exact)


def bin_gaussians(pre: PreprocessOut, grid_x: int, grid_y: int,
                  max_dup: int, max_tiles_per_gauss: int = 0) -> BinningOut:
    """Build the depth-sorted per-tile entry list with a static budget.

    Args:
        pre: preprocess output.
        grid_x, grid_y: tile grid dims.
        max_dup: static total (Gaussian, tile) entry budget.
        max_tiles_per_gauss: unused (kept for config compatibility; the slot-major
            expansion has no per-Gaussian cap).
    """
    n = pre.depth.shape[0]
    num_tiles = grid_x * grid_y

    counts = pre.tiles_touched.astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum
    total = (offsets[-1] + counts[-1]).astype(jnp.int32) if n > 0 else jnp.int32(0)

    # Entry slot e -> source Gaussian: mark offsets, forward-fill with cummax
    # (ties at equal offsets resolve to the later Gaussian, which is the first one
    # with nonzero count there).
    marks = jnp.zeros((max_dup,), jnp.int32).at[offsets].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    g = jax.lax.cummax(marks)

    # Stable depth ranking of Gaussians (reproduces radix order over positive
    # depths; ties by Gaussian index).
    rank = jnp.zeros((n,), jnp.uint32).at[jnp.argsort(pre.depth, stable=True)].set(
        jnp.arange(n, dtype=jnp.uint32))

    # ONE fused row gather for every per-Gaussian field the expansion needs —
    # separate scalar gathers of the same indices cost ~70ms each at 4M entries on
    # TPU; a single packed row gather is ~8x cheaper. f32 is exact below 2^24.
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    table = jnp.stack(
        [
            offsets.astype(jnp.float32),
            counts.astype(jnp.float32),
            pre.rect_min[:, 0].astype(jnp.float32),
            pre.rect_min[:, 1].astype(jnp.float32),
            rect_w.astype(jnp.float32),
            1.0 / rect_w.astype(jnp.float32),
            rank.astype(jnp.float32),
            jnp.zeros((n,), jnp.float32),
        ],
        axis=-1,
    )
    row = table[g]                                     # [max_dup, 8]
    offs_g = row[:, 0].astype(jnp.int32)
    counts_g = row[:, 1].astype(jnp.int32)
    rx_g = row[:, 2].astype(jnp.int32)
    ry_g = row[:, 3].astype(jnp.int32)
    wg = row[:, 4].astype(jnp.int32)
    rank_g = row[:, 6].astype(jnp.uint32)

    slot = jnp.arange(max_dup, dtype=jnp.int32) - offs_g
    valid = (slot < counts_g) & (jnp.arange(max_dup) < total)

    # slot // rect_w via reciprocal multiply + exact correction (runtime integer
    # division lowers poorly on the VPU).
    q = jnp.floor(slot.astype(jnp.float32) * row[:, 5]).astype(jnp.int32)
    r = slot - q * wg
    q = jnp.where(r < 0, q - 1, jnp.where(r >= wg, q + 1, q))
    r = slot - q * wg
    tile = jnp.where(valid, (ry_g + q) * grid_x + rx_g + r, num_tiles).astype(jnp.int32)

    rank_bits = max(1, math.ceil(math.log2(max(n, 2))))
    tile_bits = max(1, math.ceil(math.log2(num_tiles + 2)))
    if rank_bits + tile_bits <= 32:
        key = (tile.astype(jnp.uint32) << rank_bits) | rank_g
        key = jnp.where(valid, key, jnp.uint32(num_tiles) << rank_bits)
        sorted_key, sorted_gauss = jax.lax.sort((key, g), num_keys=1)
        sorted_tile = (sorted_key >> rank_bits).astype(jnp.int32)
        bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits)
        edges = jnp.searchsorted(sorted_key, bounds, side="left").astype(jnp.int32)
        tile_start, tile_end = edges[:-1], edges[1:]
    else:
        depth_e = pre.depth[g]
        sorted_tile, _, sorted_gauss = jax.lax.sort((tile, depth_e, g), num_keys=2)
        tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
        tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
        tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    return BinningOut(
        gauss_id=sorted_gauss,
        tile_id=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        num_entries=total,
        overflow=jnp.maximum(total - max_dup, 0).astype(jnp.int32),
    )


def tile_histogram(pre: PreprocessOut, grid_x: int, grid_y: int) -> jnp.ndarray:
    """Exact per-tile entry counts WITHOUT expanding entries: the tile rectangles are
    axis-aligned, so count[ty, tx] = sum_g stepy_g(ty) * stepx_g(tx) is one [gy, N] x
    [N, gx] matmul on the MXU (0/1 inputs in bf16, f32 accumulation — integer-exact
    below 2^24). Replaces a 4M-entry scatter-add histogram (~10^2 ms on TPU) with a
    matmul. The step masks are GENERATED in the contraction-minor [grid, N] layout —
    the [N, grid] form made XLA transpose 200 MB per operand before the dot
    (5.25 -> measured ~1.5 ms at 1M Gaussians, exp_r3c).
    """
    alive = (pre.tiles_touched > 0)[None, :]
    tx = jnp.arange(grid_x, dtype=jnp.int32)[:, None]
    ty = jnp.arange(grid_y, dtype=jnp.int32)[:, None]
    sx = ((pre.rect_min[None, :, 0] <= tx) & (tx < pre.rect_max[None, :, 0]) & alive)
    sy = ((pre.rect_min[None, :, 1] <= ty) & (ty < pre.rect_max[None, :, 1]))
    counts2d = jax.lax.dot_general(
        sy.astype(jnp.bfloat16), sx.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return counts2d.reshape(-1).astype(jnp.int32)  # tile-major: t = ty*grid_x + tx


def tile_histogram_intervals(pre: PreprocessOut, packed: jnp.ndarray,
                             grid_x: int, grid_y: int) -> jnp.ndarray:
    """`tile_histogram` with exact per-tile-row x-intervals (preprocess.
    row_intervals): each (Gaussian, row j < H_CAP) is a rank-1 [1 tile row x
    interval] rectangle — one step-mask matmul per j — and rows past H_CAP keep
    the full rect (one band-mask matmul). Counts match row_intervals' counts
    EXACTLY (same packed values, same integer math)."""
    from .preprocess import H_CAP

    alive = (pre.tiles_touched > 0)[None, :]
    tx = jnp.arange(grid_x, dtype=jnp.int32)[:, None]
    ty = jnp.arange(grid_y, dtype=jnp.int32)[:, None]
    x0 = pre.rect_min[None, :, 0]
    y0 = pre.rect_min[None, :, 1]
    x1 = pre.rect_max[None, :, 0]
    y1 = pre.rect_max[None, :, 1]

    HI = jax.lax.Precision.HIGHEST
    counts2d = jnp.zeros((grid_y, grid_x), jnp.float32)
    for j in range(H_CAP):
        p = packed[j][None, :]                      # [1, N] f32 exact ints
        wj = jnp.floor(p / 128.0)
        txl = x0 + (p - 128.0 * wj).astype(jnp.int32)
        wj = wj.astype(jnp.int32)
        live = alive & (wj > 0)
        sy = (ty == y0 + j) & live
        sx = (txl <= tx) & (tx < txl + wj) & live
        counts2d = counts2d + jax.lax.dot_general(
            sy.astype(jnp.bfloat16), sx.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # Tail rows (j >= H_CAP): full rect width.
    sy_t = (y0 + H_CAP <= ty) & (ty < y1) & alive
    sx_t = (x0 <= tx) & (tx < x1) & alive
    counts2d = counts2d + jax.lax.dot_general(
        sy_t.astype(jnp.bfloat16), sx_t.astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return counts2d.reshape(-1).astype(jnp.int32)


def _expand_by_counts(counts: jnp.ndarray, num_slots: int):
    """Slot s -> source row r (nondecreasing) for repeat-by-counts expansion.

    Returns (row_idx [num_slots] int32, offsets [n] int32, total scalar int32).
    """
    n = counts.shape[0]
    offsets = jnp.cumsum(counts) - counts
    total = (offsets[-1] + counts[-1]).astype(jnp.int32) if n > 0 else jnp.int32(0)
    marks = jnp.zeros((num_slots,), jnp.int32).at[offsets].max(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return jax.lax.cummax(marks), offsets, total


class AlignedEntries(NamedTuple):
    gauss_id: jnp.ndarray      # [d_aligned] int32 per aligned entry (0 on padding)
    valid: jnp.ndarray         # [d_aligned] bool
    tile_start: jnp.ndarray    # [num_tiles] int32, multiples of `chunk`
    tile_count: jnp.ndarray    # [num_tiles] int32 true entry counts
    num_entries: jnp.ndarray   # [] int32 valid entries (before budget clamp)
    overflow: jnp.ndarray      # [] int32 entries dropped by the budget (0 = exact)


def _row_col_from_intervals(slot, packed_g, wg):
    """Map a within-Gaussian slot to (tile row, tile col offset from rect_x0)
    under per-row intervals: rows 0..H_CAP-1 carry packed txl_rel + 128*w_j,
    deeper rows the full rect width. All exact f32/int math — the Pallas kernel
    computes the IDENTICAL chain (ops/pallas/expand.py)."""
    from .preprocess import H_CAP

    wj = [jnp.floor(packed_g[k] / 128.0) for k in range(H_CAP)]
    txl = [packed_g[k] - 128.0 * wj[k] for k in range(H_CAP)]
    cum = []
    acc = jnp.zeros_like(wj[0])
    for k in range(H_CAP):
        cum.append(acc)           # exclusive prefix
        acc = acc + wj[k]
    c8 = acc
    slot_f = slot.astype(jnp.float32)
    in_cap = slot_f < c8
    row8 = sum((slot_f >= cum[k]).astype(jnp.int32) for k in range(1, H_CAP))
    sel = lambda vals: sum(
        jnp.where(row8 == k, vals[k], 0.0) for k in range(H_CAP))
    col8 = sel(txl) + slot_f - sel(cum)
    # Tail: full-rect row walk past the capped rows.
    wg_f = jnp.maximum(wg.astype(jnp.float32), 1.0)
    tail = slot_f - c8
    q = jnp.floor(tail * (1.0 / wg_f))
    r = tail - q * wg_f
    q = jnp.where(r < 0, q - 1, jnp.where(r >= wg_f, q + 1, q))
    r = tail - q * wg_f
    from .preprocess import H_CAP as HC

    row = jnp.where(in_cap, row8.astype(jnp.float32), HC + q)
    col = jnp.where(in_cap, col8, r)
    return row.astype(jnp.int32), col.astype(jnp.int32)


def _expand_keys_xla(pre: PreprocessOut, counts, rect_w, n: int, max_dup: int,
                     rank_bits: int, key_invalid, grid_x: int,
                     split_key: bool = False, packed=None):
    """XLA twin of pallas/expand.py: scatter-marks + cummax slot map, 8-column table
    row-gather, elementwise key math (~43ms at 1M/4.2M on v5e — the expand kernel
    does the same join in ~1/6 the time; kept as the reference twin and the fallback
    for budgets that don't divide the kernel's 4096-slot grid).

    packed: optional [H_CAP, N] per-row interval table (preprocess.row_intervals)
    — `counts` must then be the interval counts."""
    g, offsets, total = _expand_by_counts(counts, max_dup)
    rank = jnp.zeros((n,), jnp.uint32).at[jnp.argsort(pre.depth, stable=True)].set(
        jnp.arange(n, dtype=jnp.uint32))
    cols = [
        offsets.astype(jnp.float32),
        counts.astype(jnp.float32),
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        rect_w.astype(jnp.float32),
        1.0 / rect_w.astype(jnp.float32),
        rank.astype(jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ]
    if packed is not None:
        cols += [packed[k] for k in range(packed.shape[0])]
    table = jnp.stack(cols, axis=-1)
    row = table[g]                                     # [max_dup, 8(+H_CAP)]
    offs_g = row[:, 0].astype(jnp.int32)
    counts_g = row[:, 1].astype(jnp.int32)
    rx_g = row[:, 2].astype(jnp.int32)
    ry_g = row[:, 3].astype(jnp.int32)
    wg = row[:, 4].astype(jnp.int32)
    rank_g = row[:, 6].astype(jnp.uint32)

    slot = jnp.arange(max_dup, dtype=jnp.int32) - offs_g
    valid = (slot < counts_g) & (jnp.arange(max_dup) < total)
    if packed is not None:
        packed_g = [row[:, 8 + k] for k in range(packed.shape[0])]
        q, r = _row_col_from_intervals(slot, packed_g, wg)
    else:
        q = jnp.floor(slot.astype(jnp.float32) * row[:, 5]).astype(jnp.int32)
        r = slot - q * wg
        q = jnp.where(r < 0, q - 1, jnp.where(r >= wg, q + 1, q))
        r = slot - q * wg
    tile = ((ry_g + q) * grid_x + rx_g + r).astype(jnp.uint32)
    if split_key:
        inval = jnp.uint32(0xFFFFFFFF)
        return (jnp.where(valid, tile, inval),
                jnp.where(valid, rank_g, inval), g, total)
    key_real = jnp.where(valid, (tile << rank_bits) | rank_g, key_invalid)
    return key_real, g, total


def bin_gaussians_aligned(pre: PreprocessOut, grid_x: int, grid_y: int,
                          max_dup: int, chunk: int, interpret: bool = False,
                          use_expand_kernel: bool = True,
                          slack: int = 512,
                          force_split_key: bool = False,
                          intervals=None) -> AlignedEntries:
    """One-sort binning that lands DIRECTLY in the chunk-aligned layout the Pallas
    kernels stream — replacing bin_gaussians + align_entries (which cost a second
    4.8M-entry re-index: scatter-marks, cummax, and two big gathers, ~75ms at 1M
    Gaussians on v5e).

    How: per-tile entry counts are known BEFORE any expansion via `tile_histogram`
    (an MXU matmul over the tile rectangles), so each tile's alignment padding
    (seg_t - count_t entries) can be materialized as explicit PAD entries whose sort
    key is (tile, RANK_SENTINEL) — they sort after every real entry of their tile and
    before the next tile. One stable-keyed sort of [max_dup + num_tiles*chunk] keys
    then yields segments starting exactly at the precomputed chunk-aligned offsets.

    Key packing: (tile << rank_bits) | rank as ONE u32 when the bits fit;
    otherwise (pools >= ~1M at 800^2) tile and rank ride as TWO u32 keys through
    a lexicographic 2-key sort — same aligned layout, ~30% more sort cost,
    instead of falling back to the far slower bin_gaussians + align_entries
    re-index (the r3 4M-Gaussian probe measured that fallback at 795 ms/iter).
    Pool size must stay below 2^24 (the expansion tables carry ids as exact f32).

    Overflow semantics: if total entries exceed max_dup the drop happens pre-sort
    (keys forced to u32-max, sorting past every segment) while the histogram still
    counts them, so segment contents shift — the render is garbage-but-finite and
    `overflow` reports it loudly (same contract as bin_gaussians).
    """
    from .pallas.segment_sum import MACRO

    n = pre.depth.shape[0]
    num_tiles = grid_x * grid_y
    pad_budget = num_tiles * chunk
    # Round the total entry buffer to the segment-sum kernel's DMA macro so the
    # backward reduction needs no padding copies; extra slots are always-invalid.
    # `slack` reserves room for the composite kernels to stream in chunks LARGER
    # than the alignment quantum (their last DMA per tile may read/write up to
    # kernel_chunk - chunk slots past the segment end; reads are masked, writes
    # land on the next segment before its owner overwrites them, and tail spill
    # stays inside the always-invalid rounding slots).
    d_aligned = ((max_dup + pad_budget + slack + MACRO - 1) // MACRO) * MACRO
    pad_budget = d_aligned - max_dup

    rank_bits = max(1, math.ceil(math.log2(n + 1)))  # reserve all-ones rank sentinel
    tile_bits = max(1, math.ceil(math.log2(num_tiles + 2)))
    split_key = (rank_bits + tile_bits > 32) or force_split_key
    if n >= (1 << 24):
        raise ValueError("pool size >= 2^24: expansion tables carry ids as "
                         "exact f32; shard the pool (parallel/gauss_shard.py)")
    rank_sentinel = jnp.uint32((1 << rank_bits) - 1)
    key_invalid = jnp.uint32(0xFFFFFFFF)

    # Per-row ellipse intervals (preprocess.row_intervals): drop (Gaussian,
    # tile) pairs whose whole tile sits outside the alpha >= 1/255 ellipse —
    # bitwise-free (both compositors skip them with zero gradients). Only the
    # packed-payload sort path carries the interval table; other configurations
    # fall back to rects.
    use_intervals = (intervals is not None and grid_x < 128 and grid_y < 128
                     and n < (1 << 24))

    # --- per-tile counts + aligned segment offsets (no expansion needed) ---
    if use_intervals:
        count_t = tile_histogram_intervals(pre, intervals[1], grid_x, grid_y)
    else:
        # A Pallas fused-mask histogram was probed and is NOT faster (3.15 vs
        # 3.06 ms at 1M — XLA already fuses the step masks into the dot; the
        # cost is the [grid, N] mask generation both forms share, exp_r4h).
        count_t = tile_histogram(pre, grid_x, grid_y)
    seg = ((count_t + chunk - 1) // chunk) * chunk
    seg_end = jnp.cumsum(seg).astype(jnp.int32)
    aligned_start = seg_end - seg
    # Defensive clamps: only bind when the budget overflowed (degraded-but-safe DMA).
    tile_start = jnp.minimum(aligned_start, d_aligned - chunk)
    tile_count = jnp.minimum(count_t, d_aligned - tile_start)

    # --- real entries: slot-major expansion over Gaussians ---
    counts = (intervals[0] if use_intervals
              else pre.tiles_touched).astype(jnp.int32)
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    if use_expand_kernel and max_dup % 4096 == 0 and max_dup < (1 << 23):
        from .pallas.expand import expand_entries

        # Depth-rank the rows with culled (count 0) rows sorted last, so live rows
        # form a strictly-increasing-offs prefix (the kernel's monotone-join
        # precondition). Stable ties keep the reference's duplication order.
        # Sort payload cost on TPU is per-BYTE (BENCH_LOG r2), so the four small
        # per-row fields ride ONE packed u32 payload when the grid allows
        # (7 bits per rect field, h implied by count = w*h).
        depth_key = jnp.where(counts > 0, pre.depth, jnp.inf)
        rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 1)
        if grid_x < 128 and grid_y < 128 and n < (1 << 24):
            packed = (pre.rect_min[:, 0].astype(jnp.uint32)
                      | (pre.rect_min[:, 1].astype(jnp.uint32) << 7)
                      | (rect_w.astype(jnp.uint32) << 14)
                      | (rect_h.astype(jnp.uint32) << 21))
            # Both u32 fields ride ONE c64 payload as f32 BIT PATTERNS (sort
            # payload cost is per row, BENCH_LOG r2). Bit 30 is ORed in so the
            # patterns are NORMAL floats: packed uses bits 0-27 and oid bits
            # 0-23, so without the bias oid < 2^23 would be a DENORMAL and any
            # flush-to-zero in the payload path would corrupt it; with bit 30
            # set the exponent field can never be all-ones (bits 28-29 clear),
            # so no NaN/Inf canonicalization either.
            BIAS = jnp.uint32(1 << 30)
            as_f = lambda u: jax.lax.bitcast_convert_type(u | BIAS, jnp.float32)
            un_f = lambda f: jax.lax.bitcast_convert_type(f, jnp.uint32) & ~BIAS
            ops = (depth_key,
                   jax.lax.complex(as_f(packed),
                                   as_f(jnp.arange(n, dtype=jnp.uint32))))
            if use_intervals:
                # Interval rows ride TWO more c64 payloads: p_j < 2^14, packed
                # pairwise into 28-bit u32s (BIAS keeps the bit patterns normal
                # floats, comment above).
                pk = intervals[1].astype(jnp.uint32)  # [H_CAP, N] ints < 2^14
                pv = [pk[2 * k] | (pk[2 * k + 1] << 14) for k in range(4)]
                ops = ops + (jax.lax.complex(as_f(pv[0]), as_f(pv[1])),
                             jax.lax.complex(as_f(pv[2]), as_f(pv[3])))
            out_s = jax.lax.sort(ops, num_keys=1, is_stable=True)
            dk_s, pair_s = out_s[0], out_s[1]
            packed_s = un_f(jnp.real(pair_s))
            oid_s = un_f(jnp.imag(pair_s)).astype(jnp.int32)
            rx_s = (packed_s & 0x7F).astype(jnp.int32)
            ry_s = ((packed_s >> 7) & 0x7F).astype(jnp.int32)
            w_s = ((packed_s >> 14) & 0x7F).astype(jnp.int32)
            h_s = ((packed_s >> 21) & 0x7F).astype(jnp.int32)
            if use_intervals:
                pv_s = [un_f(jnp.real(out_s[2])), un_f(jnp.imag(out_s[2])),
                        un_f(jnp.real(out_s[3])), un_f(jnp.imag(out_s[3]))]
                p_s = []
                for k in range(4):
                    p_s += [(pv_s[k] & 0x3FFF).astype(jnp.float32),
                            ((pv_s[k] >> 14) & 0x3FFF).astype(jnp.float32)]
                wsum = sum(jnp.floor(p / 128.0) for p in p_s)
                from .preprocess import H_CAP

                cnt_s = (wsum + jnp.maximum(h_s - H_CAP, 0) * w_s).astype(jnp.int32)
                cnt_s = jnp.where(jnp.isfinite(dk_s), cnt_s, 0)
            else:
                # Culled rows carry depth_key = inf: gate their counts back to 0.
                cnt_s = jnp.where(jnp.isfinite(dk_s), w_s * h_s, 0)
        else:
            _, cnt_s, rx_s, ry_s, w_s, oid_s = jax.lax.sort(
                (depth_key, counts, pre.rect_min[:, 0], pre.rect_min[:, 1],
                 rect_w, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                is_stable=True)
        offs_s = (jnp.cumsum(cnt_s) - cnt_s).astype(jnp.int32)
        total = (offs_s[-1] + cnt_s[-1]).astype(jnp.int32) if n > 0 else jnp.int32(0)
        offs_f = offs_s.astype(jnp.float32)
        rows = [offs_f, rx_s.astype(jnp.float32), ry_s.astype(jnp.float32),
                w_s.astype(jnp.float32), oid_s.astype(jnp.float32),
                jnp.arange(n, dtype=jnp.float32),
                jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32)]
        if use_intervals:
            rows += p_s
        table_t = jnp.stack(rows, axis=0)
        out = expand_entries(table_t, offs_f, total, max_dup, rank_bits,
                             grid_x, interpret=interpret, split_key=split_key,
                             intervals=use_intervals)
        if split_key:
            tile_real, rank_real, g = out
        else:
            key_real, g = out
    else:
        pk = intervals[1] if use_intervals else None
        if split_key:
            tile_real, rank_real, g, total = _expand_keys_xla(
                pre, counts, rect_w, n, max_dup, rank_bits, key_invalid, grid_x,
                split_key=True, packed=pk)
        else:
            key_real, g, total = _expand_keys_xla(pre, counts, rect_w, n,
                                                  max_dup, rank_bits,
                                                  key_invalid, grid_x,
                                                  packed=pk)

    # --- pad entries: expansion over tiles (budget num_tiles * chunk) ---
    pad_t = (seg - tile_count).astype(jnp.int32)  # clamped count keeps pads in range
    t_pad, _, total_pad = _expand_by_counts(pad_t, pad_budget)
    valid_pad = jnp.arange(pad_budget, dtype=jnp.int32) < total_pad
    gids = jnp.concatenate([g, jnp.zeros((pad_budget,), jnp.int32)])

    if split_key:
        # Lexicographic (tile, rank) 2-key sort: pads carry rank = u32-max (sort
        # after every real entry of their tile), budget-invalid rows u32-max in
        # BOTH keys (sort after every tile's segment).
        key1_pad = jnp.where(valid_pad, t_pad.astype(jnp.uint32), key_invalid)
        key2_pad = jnp.full((pad_budget,), 0xFFFFFFFF, jnp.uint32)
        keys1 = jnp.concatenate([tile_real, key1_pad])
        keys2 = jnp.concatenate([rank_real, key2_pad])
        _, sorted_rank, sorted_gauss = jax.lax.sort((keys1, keys2, gids),
                                                    num_keys=2)
        valid = sorted_rank != jnp.uint32(0xFFFFFFFF)
    else:
        key_pad = jnp.where(
            valid_pad, (t_pad.astype(jnp.uint32) << rank_bits) | rank_sentinel,
            key_invalid)
        keys = jnp.concatenate([key_real, key_pad])
        sorted_keys, sorted_gauss = jax.lax.sort((keys, gids), num_keys=1)

        # valid = the sorted key is a REAL entry: pads carry the all-ones rank
        # sentinel and budget-invalid keys are u32-max (rank bits also all-ones),
        # so one low-bits compare on the sorted keys replaces a 4.4M-slot
        # scatter-marks/cummax lane->tile map + two table gathers (~35ms at 1M).
        valid = (sorted_keys & rank_sentinel) != rank_sentinel
    return AlignedEntries(
        gauss_id=sorted_gauss,
        valid=valid,
        tile_start=tile_start,
        tile_count=tile_count,
        num_entries=total,
        overflow=jnp.maximum(total - max_dup, 0).astype(jnp.int32),
    )


def align_entries(binning: BinningOut, num_tiles: int, chunk: int,
                  d_aligned: int) -> AlignedEntries:
    """Re-index sorted entries so each tile's segment starts at a chunk-aligned
    offset — the layout the Pallas kernels stream (TPU DMA requires lane-aligned
    minor slices; CUDA had no such constraint on its flat point_list,
    rasterizer_impl.cu:303-336).

    Implemented as a pure GATHER (scatter-marks + cummax slot->tile map) — XLA
    lowers gathers far better than big scatters on TPU.

    Args:
        d_aligned: static output size >= sum(ceil(count_t / chunk) * chunk). Choose
            max_dup + num_tiles * chunk.
    """
    count = (binning.tile_end - binning.tile_start).astype(jnp.int32)
    seg = ((count + chunk - 1) // chunk) * chunk
    seg_end = jnp.cumsum(seg).astype(jnp.int32)
    aligned_start = (seg_end - seg).astype(jnp.int32)

    marks = jnp.zeros((d_aligned,), jnp.int32).at[aligned_start].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    t = jax.lax.cummax(marks)
    slot = jnp.arange(d_aligned, dtype=jnp.int32)
    # One fused row gather for the per-tile fields (see bin_gaussians).
    table = jnp.stack(
        [
            aligned_start.astype(jnp.float32),
            count.astype(jnp.float32),
            binning.tile_start.astype(jnp.float32),
            jnp.zeros((num_tiles,), jnp.float32),
        ],
        axis=-1,
    )
    row = table[t]
    within = slot - row[:, 0].astype(jnp.int32)
    count_t = row[:, 1].astype(jnp.int32)
    valid = within < count_t
    src = row[:, 2].astype(jnp.int32) + jnp.minimum(within, jnp.maximum(count_t - 1, 0))
    gauss_id = jnp.where(valid, binning.gauss_id[src], 0)
    return AlignedEntries(gauss_id=gauss_id, valid=valid,
                          tile_start=aligned_start, tile_count=count,
                          num_entries=binning.num_entries,
                          overflow=binning.overflow)
