"""Deterministic row segment-sum on TPU: the gather-transpose for Gaussian gradients.

The autodiff transpose of `feat_pack[gauss_id]` is a scatter-add of ~4M 16-float rows
into ~1M Gaussian rows. XLA's TPU scatter-add takes ~340ms for that shape — 800x off
bandwidth — and is the dominant backward cost. This kernel reaches near-bandwidth:

  1. sort entry ids (u32 radix via lax.sort, ~13ms) and permute the rows into
     id-sorted order (minor-axis gather);
  2. grid over output row blocks of B Gaussians; each block's (rounded, overlapping)
     entry range is precomputed with the scatter-marks + cummax trick;
  3. per chunk, build the (B x CHUNK) one-hot local-id matrix by iota compare and
     accumulate partial sums as an MXU matmul — f32, no atomics, fully deterministic
     (the reference accumulates these same gradients with CUDA atomicAdd,
     backward.cu:523-554, which is run-to-run nondeterministic).

Rows are streamed in the transposed [F, D] layout the rasterizer already uses.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(starts_ref, uppers_ref, rows_hbm, out_ref, scratch_rows, sems,
            *, block, chunk, f_pad, id_row):
    b = pl.program_id(0)
    start = starts_ref[b]          # chunk-aligned, inclusive
    end = uppers_ref[b]            # chunk-aligned upper bound (exclusive)
    n_chunks = pl.cdiv(jnp.maximum(end - start, 0), chunk)

    def get_dma(slot, c_idx):
        off = pl.multiple_of(start + c_idx * chunk, chunk)
        return pltpu.make_async_copy(rows_hbm.at[:, pl.ds(off, chunk)],
                                     scratch_rows.at[slot], sems.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(c_idx, acc):
        slot = jnp.remainder(c_idx, 2)

        @pl.when(c_idx + 1 < n_chunks)
        def _():
            get_dma(jnp.remainder(c_idx + 1, 2), c_idx + 1).start()

        get_dma(slot, c_idx).wait()
        rows = scratch_rows[slot]                        # [F+8, CHUNK]
        # ids ride as a float row (exact for ids < 2^24).
        local = (rows[id_row : id_row + 1, :]).astype(jnp.int32) - b * block
        onehot = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (block, chunk), 0) == local,
            1.0, 0.0,
        )
        return acc + jax.lax.dot_general(
            onehot, rows[:f_pad], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    acc = jax.lax.fori_loop(0, n_chunks, body,
                            jnp.zeros((block, f_pad), jnp.float32))
    out_ref[...] = acc


def segment_sum_rows(rows_t: jnp.ndarray, ids: jnp.ndarray, num_segments: int,
                     block: int = 256, chunk: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """Sum rows with equal ids: out[i, :] = sum over e with ids[e] == i of
    rows_t[:, e].

    Args:
        rows_t: [F, D] rows in transposed layout (F a multiple of 8).
        ids: [D] int32 in [0, num_segments) (out-of-range ids are dropped).
    Returns:
        [num_segments_padded >= num_segments, F] — caller slices.
    """
    f_pad, d = rows_t.shape
    n_pad = ((num_segments + block - 1) // block) * block
    n_blocks = n_pad // block

    ids_s, perm = jax.lax.sort(
        (ids.astype(jnp.uint32), jnp.arange(d, dtype=jnp.int32)), num_keys=1)
    ids_s = ids_s.astype(jnp.int32)
    rows_s = rows_t[:, perm]

    # Chunk-aligned entry range per output block via scatter-marks + cummax: with
    # sorted ids, block b's entries are [cum_last[b-1], cum_last[b]). Round the start
    # down and the end up to chunk alignment — the overlap into neighboring blocks is
    # masked by the local-id one-hot.
    blk = jnp.where(ids_s >= 0, ids_s // block, n_blocks)
    pos = jnp.arange(d, dtype=jnp.int32)
    last0 = jnp.zeros((n_blocks,), jnp.int32).at[blk].max(pos + 1, mode="drop")
    cum_last = jax.lax.cummax(last0)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_last[:-1]])
    starts = (prev // chunk) * chunk
    uppers = ((cum_last + chunk - 1) // chunk) * chunk
    uppers = jnp.maximum(uppers, starts)

    # Append the ids as an extra float row (exact for ids < 2^24), pad the tail so
    # aligned DMA never reads out of range (padding ids = -1 match nothing).
    assert num_segments < (1 << 24), "float id row requires < 2^24 segments"
    pad = ((-d) % chunk) + chunk
    ids_f = jnp.concatenate([ids_s.astype(jnp.float32), jnp.full((pad,), -1.0)])
    rows_s = jnp.concatenate([rows_s, jnp.zeros((f_pad, pad), rows_s.dtype)], axis=1)
    aug = jnp.concatenate([rows_s, ids_f[None, :],
                           jnp.zeros((7, rows_s.shape[1]), rows_s.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block, f_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad + 8, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, block=block, chunk=chunk, f_pad=f_pad,
                               id_row=f_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        interpret=interpret,
    )(starts, uppers, aug)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_t(feat_pack, gid, num_segments: int, interpret: bool = False):
    """feat_pack[gid].T with a Pallas segment-sum transpose instead of XLA's slow
    scatter-add. feat_pack: [N, F_pad] -> [F_pad, D]."""
    return feat_pack[gid].T


def _grt_fwd(feat_pack, gid, num_segments, interpret):
    return feat_pack[gid].T, gid


def _grt_bwd(num_segments, interpret, gid, g_rows_t):
    d_pack = segment_sum_rows(g_rows_t, gid, num_segments,
                              interpret=interpret)[:num_segments]
    return d_pack, None


gather_rows_t.defvjp(_grt_fwd, _grt_bwd)
