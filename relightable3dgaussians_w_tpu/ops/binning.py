"""Tile binning: duplicate expansion, (tile, depth) sort, per-tile ranges.

TPU-native re-design of the reference's CUB pipeline (`duplicateWithKeys` +
`DeviceRadixSort` + `identifyTileRanges`, cuda_rasterizer/rasterizer_impl.cu:70-138,
198-336). The CUDA code sizes its key buffer from a device->host read of the scanned
duplicate count; XLA requires static shapes, so this version uses a *static duplicate
budget* (`max_dup`) plus per-Gaussian tile cap (`max_tiles_per_gauss`) and reports
overflow counters instead of resizing — correctness degrades loudly (see SURVEY.md §7
"Hard parts"). Sorting uses `jax.lax.sort` with lexicographic (tile, depth) keys, which
replaces the packed 64-bit [tileID‖float-depth-bits] radix keys; both orderings agree
for the positive depths that survive the z>0.2 near cull.
"""

from __future__ import annotations

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
    overflow: jnp.ndarray    # [] int32: entries dropped by either budget (0 = exact)


def bin_gaussians(pre: PreprocessOut, grid_x: int, grid_y: int,
                  max_dup: int, max_tiles_per_gauss: int) -> BinningOut:
    """Build the depth-sorted per-tile entry list with a static budget.

    Args:
        pre: preprocess output.
        grid_x, grid_y: tile grid dims.
        max_dup: static total (Gaussian, tile) entry budget.
        max_tiles_per_gauss: static per-Gaussian tile cap (duplicateWithKeys emits one
            entry per overlapped tile with no cap; entries beyond this cap are counted
            in `overflow`).
    """
    n = pre.depth.shape[0]
    num_tiles = grid_x * grid_y
    k = max_tiles_per_gauss

    counts = jnp.minimum(pre.tiles_touched, k)
    offsets = jnp.cumsum(counts) - counts  # exclusive prefix sum, like the CUB InclusiveSum shifted
    total = offsets[-1] + counts[-1] if n > 0 else jnp.int32(0)

    # Entry e = (gaussian g, slot s) covers the s-th tile of g's rect in row-major order.
    g_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32)[:, None], k, axis=1)  # [N, K]
    slot = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :], (n, k))
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)[:, None]
    ty = pre.rect_min[:, 1][:, None] + slot // rect_w
    tx = pre.rect_min[:, 0][:, None] + slot % rect_w
    tile = ty * grid_x + tx  # [N, K]

    valid = slot < counts[:, None]
    # Destination index in the compact entry buffer; invalid/overflowing entries get an
    # out-of-range destination and are dropped by the scatter (mode='drop').
    dest = jnp.where(valid, offsets[:, None] + slot, max_dup)

    entry_tile = jnp.full((max_dup,), num_tiles, dtype=jnp.int32)
    entry_gauss = jnp.zeros((max_dup,), dtype=jnp.int32)
    entry_tile = entry_tile.at[dest.reshape(-1)].set(tile.reshape(-1).astype(jnp.int32), mode="drop")
    entry_gauss = entry_gauss.at[dest.reshape(-1)].set(g_idx.reshape(-1), mode="drop")
    entry_depth = pre.depth[entry_gauss]
    # Padding entries keep the sentinel tile and sort to the back regardless of depth.

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (entry_tile, entry_depth, entry_gauss), num_keys=2
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    dropped_cap = jnp.sum(pre.tiles_touched - counts)
    dropped_budget = jnp.maximum(total - max_dup, 0)
    return BinningOut(
        gauss_id=sorted_gauss,
        tile_id=sorted_tile,
        tile_start=tile_start,
        tile_end=tile_end,
        num_entries=total.astype(jnp.int32),
        overflow=(dropped_cap + dropped_budget).astype(jnp.int32),
    )


class AlignedEntries(NamedTuple):
    gauss_id: jnp.ndarray      # [d_aligned] int32 per aligned entry (0 on padding)
    valid: jnp.ndarray         # [d_aligned] bool
    tile_start: jnp.ndarray    # [num_tiles] int32, multiples of `chunk`
    tile_count: jnp.ndarray    # [num_tiles] int32 true entry counts


def align_entries(binning: BinningOut, num_tiles: int, chunk: int,
                  d_aligned: int) -> AlignedEntries:
    """Re-index sorted entries so each tile's segment starts at a chunk-aligned
    offset — the layout the Pallas kernels stream (TPU DMA requires lane-aligned
    minor slices; CUDA had no such constraint on its flat point_list,
    rasterizer_impl.cu:303-336).

    Implemented as a pure GATHER (per aligned slot: find its tile by binary search
    over segment ends, then its source entry) — XLA lowers gathers far better than
    big scatters on TPU.

    Args:
        d_aligned: static output size >= sum(ceil(count_t / chunk) * chunk). Choose
            max_dup + num_tiles * chunk.
    """
    count = (binning.tile_end - binning.tile_start).astype(jnp.int32)
    seg = ((count + chunk - 1) // chunk) * chunk
    seg_end = jnp.cumsum(seg).astype(jnp.int32)
    aligned_start = (seg_end - seg).astype(jnp.int32)

    # Slot -> tile map via scatter-marks + cummax (a searchsorted over millions of
    # slots is ~25x slower on TPU): mark each segment start with its tile id (max
    # resolves empty-segment ties toward the later tile), then forward-fill.
    marks = jnp.zeros((d_aligned,), jnp.int32).at[aligned_start].max(
        jnp.arange(num_tiles, dtype=jnp.int32), mode="drop")
    t = jax.lax.cummax(marks)
    slot = jnp.arange(d_aligned, dtype=jnp.int32)
    within = slot - aligned_start[t]
    valid = within < count[t]
    src = binning.tile_start[t] + jnp.minimum(within, jnp.maximum(count[t] - 1, 0))
    gauss_id = jnp.where(valid, binning.gauss_id[src], 0)
    return AlignedEntries(gauss_id=gauss_id, valid=valid,
                          tile_start=aligned_start, tile_count=count)
