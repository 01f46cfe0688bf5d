"""Deterministic row segment-sum on TPU: the gather-transpose for Gaussian gradients.

The autodiff transpose of `feat_pack[gauss_id]` is a scatter-add of ~4.8M F-float
rows into ~1M Gaussian rows. XLA's TPU scatter-add takes ~500ms for that shape and a
sort + explicit row permute costs ~130ms (XLA's big random gathers/permutes run
~40x off HBM bandwidth at this shape: ~110ms for 300MB). This version:

  1. sorts the GRADIENT ROWS THEMSELVES as sort payloads keyed by segment id
     (`lax.sort` moves payload through its passes at high bandwidth: measured
     ~20ms + ~4.3ms per f32 payload at 4.8M entries — ~60ms for 9 rows, vs
     130ms+ for sort-then-permute);
  2. grids over output row blocks of B Gaussians; each block's (macro-rounded,
     overlapping) entry range is precomputed with the scatter-marks + cummax trick;
  3. per macro-chunk, builds (B x LANES) one-hot local-id matrices by iota compare
     and accumulates partial sums as MXU matmuls — f32, no atomics, fully
     deterministic (the reference accumulates these same gradients with CUDA
     atomicAdd, backward.cu:523-554, which is run-to-run nondeterministic).

The sorted rows stay as separate [D] arrays, reshaped (free) to [D/(8*lanes), 8,
lanes] so the per-macro DMA slices a LEADING UNTILED dim — Mosaic rejects dynamic
slices along the tiled sublane dim of a 2D memref ("must be aligned to tiling (8)").
No concatenation copies anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512
SUBROWS = 8
MACRO = SUBROWS * LANES  # entries per DMA step; D must be a multiple of this


def _kernel(starts_ref, uppers_ref, ids_ref, *rest, block, f_used, f_pad):
    row_refs = rest[:f_used]
    out_ref = rest[f_used]
    ids_scratch, rows_scratch, sems, id_sems = rest[f_used + 1:]

    b = pl.program_id(0)
    start_m = starts_ref[b]          # macro index, inclusive
    upper_m = uppers_ref[b]          # macro index, exclusive
    n_macros = jnp.maximum(upper_m - start_m, 0)

    @pl.when(b == 0)
    def _():
        # Rows f_used..f_pad ride through the matmul but are never DMA'd: zero once
        # (scratch persists across the sequential grid).
        if f_used < f_pad:
            rows_scratch[0, f_used:] = jnp.zeros(
                (f_pad - f_used, SUBROWS, LANES), jnp.float32)
            rows_scratch[1, f_used:] = jnp.zeros(
                (f_pad - f_used, SUBROWS, LANES), jnp.float32)

    def get_dmas(slot, m_idx):
        row = start_m + m_idx
        dmas = [pltpu.make_async_copy(ids_ref.at[pl.ds(row, 1)],
                                      ids_scratch.at[slot], id_sems.at[slot])]
        for i, r in enumerate(row_refs):
            dmas.append(pltpu.make_async_copy(r.at[pl.ds(row, 1)],
                                              rows_scratch.at[slot, pl.ds(i, 1)],
                                              sems.at[slot, i]))
        return dmas

    @pl.when(n_macros > 0)
    def _():
        for dma in get_dmas(0, 0):
            dma.start()

    def body(m_idx, acc):
        slot = jnp.remainder(m_idx, 2)

        @pl.when(m_idx + 1 < n_macros)
        def _():
            for dma in get_dmas(jnp.remainder(m_idx + 1, 2), m_idx + 1):
                dma.start()

        for dma in get_dmas(slot, m_idx):
            dma.wait()
        ids_v = ids_scratch[slot, 0] - b * block          # [SUBROWS, LANES] int32
        rows_v = rows_scratch[slot]                       # [f_pad, SUBROWS, LANES]
        iota = jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 0)
        for j in range(SUBROWS):                          # static unroll
            onehot = jnp.where(iota == ids_v[j : j + 1, :], 1.0, 0.0)
            acc = acc + jax.lax.dot_general(
                onehot, rows_v[:, j, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return acc

    acc = jax.lax.fori_loop(0, n_macros, body,
                            jnp.zeros((block, f_pad), jnp.float32))
    out_ref[...] = acc


def segment_sum_rows(rows, ids: jnp.ndarray, num_segments: int,
                     block: int = 512, interpret: bool = False) -> jnp.ndarray:
    """Sum rows with equal ids: out[i, f] = sum over e with ids[e] == i of
    rows[f][e].

    Args:
        rows: sequence of F [D] f32 arrays (D a multiple of MACRO=4096).
        ids: [D] int32 in [0, num_segments).
    Returns:
        [num_segments_padded >= num_segments, F_pad >= F] — caller slices.
    """
    rows = list(rows)
    f_used = len(rows)
    d = rows[0].shape[0]
    assert d % MACRO == 0, f"D must be a multiple of {MACRO} (pad the entry budget)"
    f_pad = max(8, ((f_used + 7) // 8) * 8)
    n_pad = ((num_segments + block - 1) // block) * block
    n_blocks = n_pad // block

    sorted_ops = jax.lax.sort((ids.astype(jnp.uint32),) + tuple(rows), num_keys=1)
    ids_s = sorted_ops[0].astype(jnp.int32)
    rows_s = [r.reshape(d // MACRO, SUBROWS, LANES) for r in sorted_ops[1:]]
    ids_3d = ids_s.reshape(d // MACRO, SUBROWS, LANES)

    # Macro-aligned entry range per output block via scatter-marks + cummax: with
    # sorted ids, block b's entries are [cum_last[b-1], cum_last[b]). Round outward
    # to macro boundaries — overlap into neighbors is masked by the one-hot.
    blk = jnp.minimum(ids_s // block, n_blocks - 1)
    pos = jnp.arange(d, dtype=jnp.int32)
    last0 = jnp.zeros((n_blocks,), jnp.int32).at[blk].max(pos + 1, mode="drop")
    cum_last = jax.lax.cummax(last0)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_last[:-1]])
    starts_m = prev // MACRO
    uppers_m = (cum_last + MACRO - 1) // MACRO
    uppers_m = jnp.maximum(uppers_m, starts_m)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + f_used),
        out_specs=pl.BlockSpec((block, f_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, SUBROWS, LANES), jnp.int32),
            pltpu.VMEM((2, f_pad, SUBROWS, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2, f_used)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, block=block, f_used=f_used, f_pad=f_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        interpret=interpret,
    )(starts_m, uppers_m, ids_3d, *rows_s)
    return out


def segment_sum_rows_jnp(rows, ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Pure-jnp twin of segment_sum_rows (parity tests / CPU)."""
    rows = jnp.stack(list(rows), axis=-1)  # [D, F]
    return jax.ops.segment_sum(rows, ids, num_segments=num_segments)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_rows_t(feat_pack, gid, num_segments: int, f_used: int,
                  interpret: bool = False):
    """feat_pack[gid].T with a Pallas segment-sum transpose instead of XLA's slow
    scatter-add. feat_pack: [N, F_pad] -> [F_pad, D]. Only the first `f_used`
    feature columns carry gradients (the rest are structural zero padding)."""
    return feat_pack[gid].T


def _grt_fwd(feat_pack, gid, num_segments, f_used, interpret):
    return feat_pack[gid].T, gid


def _grt_bwd(num_segments, f_used, interpret, gid, g_rows_t):
    f_pad = g_rows_t.shape[0]
    rows = [g_rows_t[i] for i in range(f_used)]
    d_used = segment_sum_rows(rows, gid, num_segments,
                              interpret=interpret)[:num_segments, :f_used]
    if f_used < f_pad:
        d_used = jnp.pad(d_used, ((0, 0), (0, f_pad - f_used)))
    return d_used, None


gather_rows_t.defvjp(_grt_fwd, _grt_bwd)
