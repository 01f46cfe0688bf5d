"""Pallas TPU kernel for entry expansion: (Gaussian, tile-slot) -> sort keys.

TPU-native replacement for the reference's `duplicateWithKeys`
(cuda_rasterizer/rasterizer_impl.cu:70-111), which writes one (tileID|depth) key per
(Gaussian, overlapped tile) via per-thread global stores. The XLA formulation of the
same expansion (scatter-marks + cummax slot map, an 8-column table row-gather, then
elementwise key math) costs ~43ms at 1M Gaussians / 4.2M entries on v5e — dominated
by the 4.2M-row random gather and the 4.2M-slot scatter+cummax.

This kernel exploits that the slot->row map is a MONOTONE JOIN: rows (Gaussians,
pre-sorted by depth) and slots (expansion entries) are co-sorted, so the whole
expansion is one sequential co-iteration. Design:

* the per-row table is stored TRANSPOSED [8, N_pad] with rows
  [offs, rect_x, rect_y, rect_w, gauss_id, rank, 0, 0]; a 3-deep ring of
  BLOCK=640-column slabs (640 = 5*128, so every DMA offset is lane-aligned) advances
  monotonically — every slab is fetched exactly ONCE (~1.6k DMAs total at 1M rows).
* per sub-chunk of SC=512 slots, the slot->row match is an exact one-hot
  M[s, r] = (offs_r <= slot_s < offs_{r+1}) over the 1280 resident rows (slots on
  sublanes, rows on lanes — no transposes anywhere), and the row->slot gather of all
  6 table columns is ONE MXU matmul with the one-sided bf16 Dekker split (the one-hot
  makes every product exact; integers < 2^24 recover exactly).
* a 512-slot sub-chunk consumes at most 513 rows (every live row spans >= 1 slot), so
  the ring advances at most one 640-row slab per sub-chunk and the 1280-row resident
  window always covers the match range — no dynamic while loops.
* tile id per slot is computed in-kernel from the gathered rect (the reference's
  row-major rect walk, rasterizer_impl.cu:89-103); keys pack (tile << rank_bits) |
  rank exactly as the XLA twin (_expand_keys_xla).

The table must be in DEPTH-RANK order with culled rows (count 0) sorted last, so live
rows form a strictly-increasing-offs prefix; `rank` is then the row index itself.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 640     # rows per ring slab (must be a multiple of 128: lane-aligned DMAs)
SC = 512        # slots per sub-chunk (one M matmul)
SUPER = 4096    # slots per grid step (8 sub-chunks -> [SC, 8] output blocks)
OFFS_PAD = float(1 << 24)  # offs sentinel on table padding rows (> any slot)


def _split3(x):
    """One-sided Dekker split along sublanes: [8, L] -> [24, L] bf16."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid, lo], axis=0)


def _expand_kernel(g0s_ref, total_ref, tbl_hbm, keys_ref, gid_ref, rank_ref,
                   scr, sems, b_smem, *, rank_bits, grid_x, n_super,
                   split_key, intervals):
    c = pl.program_id(0)
    total = total_ref[0].astype(jnp.float32)
    R = 16 if intervals else 8

    def fetch(block, slot):
        return pltpu.make_async_copy(
            tbl_hbm.at[:, pl.ds(pl.multiple_of(block * BLOCK, 128), BLOCK)],
            scr.at[slot], sems.at[slot])

    @pl.when(c == 0)
    def _():
        for s in range(3):
            fetch(s, s).start()
        fetch(0, 0).wait()
        fetch(1, 1).wait()
        b_smem[0] = 0

    for i in range(SUPER // SC):
        sub = c * (SUPER // SC) + i
        g0 = g0s_ref[sub]
        need = g0 // BLOCK

        # Ring advance. Invariant: consecutive sub-chunks advance g0 by <= SC + 1
        # < BLOCK rows (callers clamp g0 queries to the last live slot), so at most
        # one advance per sub-chunk; slab b+2 is always the single in-flight fetch.
        b0 = b_smem[0]

        @pl.when(need > b0)
        def _():
            fetch(b0 + 2, jax.lax.rem(b0 + 2, 3)).wait()
            fetch(b0 + 3, jax.lax.rem(b0 + 3, 3)).start()
            b_smem[0] = b0 + 1

        b = b_smem[0]
        cur = scr[jax.lax.rem(b, 3)]            # [R, BLOCK]
        nxt = scr[jax.lax.rem(b + 1, 3)]
        tbl = jnp.concatenate([cur, nxt], axis=1)           # [R, 2B]
        offs = tbl[0:1, :]                                  # [1, 2B]
        offs_next = jnp.concatenate(
            [offs[:, 1:], jnp.full((1, 1), OFFS_PAD, jnp.float32)], axis=1)

        # Slot ids as exact f32 (< 2^24), sublane-major [SC, 1].
        slots = (jnp.asarray(sub * SC, jnp.float32)
                 + jax.lax.broadcasted_iota(jnp.int32, (SC, 1), 0).astype(jnp.float32))
        m = (offs <= slots) & (offs_next > slots)           # [SC, 2B] one-hot rows
        mb = jnp.where(m, 1.0, 0.0).astype(jnp.bfloat16)

        # Gather all table columns for each slot: one MXU matmul, exact (one-hot x
        # Dekker-split integers < 2^24). [SC, 2B] x [3R, 2B] -> [SC, 3R].
        g24 = jax.lax.dot_general(mb, _split3(tbl), (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        def col(j):
            return (g24[:, j:j + 1] + g24[:, R + j:R + j + 1]
                    + g24[:, 2 * R + j:2 * R + j + 1])

        offs_g, rx, ry, w, oid, rank = (col(j) for j in range(6))
        w = jnp.maximum(w, 1.0)  # unmatched (invalid) slots gather zeros
        slot_loc = slots - offs_g
        if intervals:
            # Per-row interval walk (ops/binning._row_col_from_intervals — the
            # twin computes the IDENTICAL elementwise chain): packed_j carries
            # txl_rel + 128*w_j for the first 8 tile rows; deeper rows fall
            # back to the full-rect walk. All values exact small ints in f32
            # (1/128 is a power of two: products and floors exact).
            ps = [col(8 + k) for k in range(8)]
            wj = [jnp.floor(p * (1.0 / 128.0)) for p in ps]
            txl = [ps[k] - 128.0 * wj[k] for k in range(8)]
            cum = []
            acc = jnp.zeros_like(slot_loc)
            for k in range(8):
                cum.append(acc)
                acc = acc + wj[k]
            c8 = acc
            in_cap = slot_loc < c8
            row8 = sum(jnp.where(slot_loc >= cum[k], 1.0, 0.0)
                       for k in range(1, 8))
            sel = lambda vals: sum(
                jnp.where(row8 == k, vals[k], 0.0) for k in range(8))
            col8 = sel(txl) + slot_loc - sel(cum)
            tail = slot_loc - c8
            q = jnp.floor(tail * (1.0 / w))
            r = tail - q * w
            q = jnp.where(r < 0, q - 1, jnp.where(r >= w, q + 1, q))
            r = tail - q * w
            q = jnp.where(in_cap, row8, 8.0 + q)
            r = jnp.where(in_cap, col8, r)
        else:
            # Row-major rect walk: q = slot_loc // w via reciprocal + one correction.
            q = jnp.floor(slot_loc * (1.0 / w))
            r = slot_loc - q * w
            q = jnp.where(r < 0, q - 1, jnp.where(r >= w, q + 1, q))
            r = slot_loc - q * w
        tile = (ry + q) * jnp.float32(grid_x) + rx + r      # exact, < 2^24

        valid = slots < total
        if split_key:
            # Pool too large for (tile << rank_bits) | rank to fit u32: emit the
            # tile and rank as SEPARATE u32 sort keys (lexicographic 2-key sort
            # downstream). Invalid slots carry all-ones in both.
            keys_ref[0, :, i:i + 1] = jnp.where(valid, tile.astype(jnp.int32),
                                                jnp.int32(-1))
            rank_ref[0, :, i:i + 1] = jnp.where(valid, rank.astype(jnp.int32),
                                                jnp.int32(-1))
        else:
            key = (tile.astype(jnp.int32) << rank_bits) | rank.astype(jnp.int32)
            keys_ref[0, :, i:i + 1] = jnp.where(valid, key, jnp.int32(-1))
        gid_ref[0, :, i:i + 1] = jnp.where(valid, oid.astype(jnp.int32), 0)

    @pl.when(c == n_super - 1)
    def _():
        b = b_smem[0]
        fetch(b + 2, jax.lax.rem(b + 2, 3)).wait()  # never exit with a DMA in flight


def expand_entries(table_t: jnp.ndarray, offs_live: jnp.ndarray, total: jnp.ndarray,
                   max_dup: int, rank_bits: int, grid_x: int,
                   interpret: bool = False, split_key: bool = False,
                   intervals: bool = False):
    """Expand depth-ranked rows into per-slot (key, gauss_id).

    Args:
        table_t: [8, N] f32 rows [offs, rect_x, rect_y, rect_w, gauss_id, rank, 0, 0]
            in depth-rank order, live (count > 0) rows first with strictly
            increasing offs; culled rows carry offs = total.
        offs_live: [N] f32 the offs row (for the host-side window starts).
        total: [] int32 number of real entries.
        max_dup: static slot budget; must be a multiple of 4096.
        split_key: when the packed (tile || rank) key exceeds 32 bits (pools
            >= ~1M at 800^2: rank_bits + tile_bits > 32), emit tile and rank as
            separate u32 keys for a lexicographic 2-key sort.
    Returns:
        split_key=False: (keys [max_dup] uint32 = (tile << rank_bits) | rank,
            0xFFFFFFFF when invalid; gid [max_dup] int32).
        split_key=True: (tile_keys, rank_keys, gid) — u32/u32/int32, invalid
            slots all-ones in both key arrays.
    """
    if max_dup % SUPER != 0:
        raise ValueError(f"max_dup must be a multiple of {SUPER}")
    R = 16 if intervals else 8
    assert table_t.shape[0] == R, (table_t.shape, intervals)
    n = table_t.shape[1]
    n_super = max_dup // SUPER
    n_sub = max_dup // SC
    sub_per = SUPER // SC

    n_pad = ((n + BLOCK - 1) // BLOCK + 3) * BLOCK
    pad = jnp.zeros((R, n_pad - n), jnp.float32).at[0, :].set(OFFS_PAD)
    tbl = jnp.concatenate([table_t, pad], axis=1)

    # First matching row per sub-chunk; queries clamped to the last live slot so g0
    # never jumps into the culled tail (preserves the <= 1-advance-per-sub-chunk
    # invariant the kernel relies on).
    s0 = jnp.arange(n_sub, dtype=jnp.int32) * SC
    s0 = jnp.minimum(s0, jnp.maximum(total - 1, 0))
    g0s = (jnp.searchsorted(offs_live, s0.astype(jnp.float32), side="right")
           .astype(jnp.int32) - 1)
    g0s = jnp.maximum(g0s, 0)

    blk = lambda: pl.BlockSpec((1, SC, sub_per), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[blk(), blk(), blk()],
        scratch_shapes=[
            pltpu.VMEM((3, R, BLOCK), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_expand_kernel, rank_bits=rank_bits, grid_x=grid_x,
                               n_super=n_super, split_key=split_key,
                               intervals=intervals)
    out_sh = jax.ShapeDtypeStruct((n_super, SC, sub_per), jnp.int32)
    keys, gid, rank = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_sh, out_sh, out_sh],
        interpret=interpret,
    )(g0s, total[None], tbl)
    # Slot (c, i, s) lives at keys[c, s, i]: transpose back to slot-major.
    u32 = lambda a: jax.lax.bitcast_convert_type(
        a.transpose(0, 2, 1).reshape(max_dup), jnp.uint32)
    gid = gid.transpose(0, 2, 1).reshape(max_dup)
    if split_key:
        return u32(keys), u32(rank), gid
    return u32(keys), gid
