"""Deterministic row segment-sum on TPU: the gather-transpose for Gaussian gradients.

The autodiff transpose of `feat_pack[gauss_id]` is a scatter-add of ~4.8M F-float
rows into ~1M Gaussian rows. XLA's TPU scatter-add takes ~500ms for that shape and a
sort + explicit row permute costs ~130ms (XLA's big random gathers/permutes run
~40x off HBM bandwidth at this shape: ~110ms for 300MB). This version:

  1. sorts the GRADIENT ROWS THEMSELVES as sort payloads keyed by segment id
     (`lax.sort` moves payload through its passes at high bandwidth: ~42ms for
     key + 9 f32 rows at 4.8M entries, vs 130ms+ for sort-then-permute);
  2. packs the sorted rows into ONE [n_macros, F, 4096] array so each grid step
     issues a single 144KB DMA instead of F small ones (the per-row DMA variant
     measured 100ms at this shape — pure descriptor latency: ~39k 16KB DMAs);
  3. grids over output row blocks of B Gaussians; each block's (macro-rounded,
     overlapping) entry range is precomputed with the scatter-marks + cummax trick;
  4. per macro-chunk, builds a (B x 4096) one-hot membership matrix by iota compare
     and reduces all F rows with ONE MXU matmul — f32, no atomics, fully
     deterministic (the reference accumulates these same gradients with CUDA
     atomicAdd, backward.cu:523-554, which is run-to-run nondeterministic).

Precision: the one-hot factor is exactly representable in bf16, so a one-sided
Dekker split of the row values (hi/mid/lo bf16 terms, each product exact on the MXU)
reproduces the f32 segment-sum to ~2^-26 relative — the accuracy of
precision=HIGHEST at 3 MXU passes instead of 6, and those passes ride ONE matmul
with a 4096-deep contraction instead of eight 512-deep N=16 slivers.

The DMA slices a LEADING UNTILED dim ([m] of [M, F, 4096]) — Mosaic rejects dynamic
slices along the tiled sublane dim of a 2D memref ("must be aligned to tiling (8)").
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MACRO = 4096  # entries per DMA step; D must be a multiple of this


def _kernel(starts_ref, uppers_ref, packed_ref, out_ref,
            rows_scratch, sems, *, block, f_used, f_pad, f_dma, passes):
    b = pl.program_id(0)
    start_m = starts_ref[b]          # macro index, inclusive
    upper_m = uppers_ref[b]          # macro index, exclusive
    n_macros = jnp.maximum(upper_m - start_m, 0)

    def get_dma(slot, m_idx):
        return pltpu.make_async_copy(packed_ref.at[pl.ds(start_m + m_idx, 1)],
                                     rows_scratch.at[slot], sems.at[slot])

    @pl.when(n_macros > 0)
    def _():
        get_dma(0, 0).start()

    iota_b = jax.lax.broadcasted_iota(jnp.int32, (block, MACRO), 0).astype(jnp.float32)

    def body(m_idx, acc):
        slot = jnp.remainder(m_idx, 2)

        @pl.when(m_idx + 1 < n_macros)
        def _():
            get_dma(jnp.remainder(m_idx + 1, 2), m_idx + 1).start()

        get_dma(slot, m_idx).wait()
        # Row 0 carries the segment ids as exact f32 (< 2^24); rows 1..1+f_used are
        # the gradient rows; the rest is alignment padding (sublane slices of an
        # HBM memref must be multiples of 8).
        ids_v = rows_scratch[slot, 0, 0:1] - b * block    # [1, MACRO] f32, exact
        rows_v = rows_scratch[slot, 0, 1:1 + f_used]      # [f_used, MACRO] f32
        # One-sided Dekker split: rows = hi + mid (+ lo) with each term bf16 and
        # the residuals computed exactly in f32. passes=3 reproduces f32 to
        # ~2^-26 rel; passes=2 to ~2^-16 — plenty for GRADIENT sums (Adam's
        # normalization; the r1c 2-pass prefix matmuls use the same argument)
        # and 1/3 fewer MXU rows.
        terms = []
        r = rows_v
        for _ in range(passes):
            t = r.astype(jnp.bfloat16)
            terms.append(t)
            r = r - t.astype(jnp.float32)
        hml = jnp.concatenate(terms, axis=0)              # [passes*f_used, MACRO]
        onehot = jnp.where(ids_v == iota_b, 1.0, 0.0).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            hml, onehot, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [passes*f_used, block]

    acc = jax.lax.fori_loop(0, n_macros, body,
                            jnp.zeros((passes * f_used, block), jnp.float32))
    total = acc[:f_used]
    for p in range(1, passes):
        total = total + acc[p * f_used:(p + 1) * f_used]
    out = total.T                                         # [block, f_used]
    if f_used < f_pad:
        out = jnp.concatenate(
            [out, jnp.zeros((block, f_pad - f_used), jnp.float32)], axis=1)
    out_ref[...] = out


def segment_sum_rows(rows, ids: jnp.ndarray, num_segments: int,
                     block: int = 1024, interpret: bool = False,
                     presorted: bool = False,
                     passes: int | None = None) -> jnp.ndarray:
    """Sum rows with equal ids: out[i, f] = sum over e with ids[e] == i of
    rows[f][e].

    Args:
        rows: sequence of F [D] f32 arrays (D a multiple of MACRO=4096).
        ids: [D] int32 in [0, num_segments).
        presorted: skip the id sort (profiling; ids must be nondecreasing).
    Returns:
        [num_segments_padded >= num_segments, F_pad >= F] — caller slices.
    """
    if passes is None:
        passes = int(os.environ.get("SEGSUM_PASSES", "3"))
    rows = list(rows)
    f_used = len(rows)
    d = rows[0].shape[0]
    assert d % MACRO == 0, f"D must be a multiple of {MACRO} (pad the entry budget)"
    f_pad = max(8, ((f_used + 7) // 8) * 8)
    n_pad = ((num_segments + block - 1) // block) * block
    n_blocks = n_pad // block

    if presorted:
        sorted_ops = (ids.astype(jnp.uint32),) + tuple(rows)
    else:
        # Pack payload rows pairwise into complex64: the sort only MOVES payload
        # bytes (no arithmetic), so real/imag round-trips bitwise while halving
        # the per-payload sort-pass count — measured ~2-4 ms/payload/2.4M on v5e,
        # and the training path carries 6 + 13 AOV gradient rows through here.
        n_pairs = f_used // 2
        pairs = tuple(jax.lax.complex(rows[2 * i], rows[2 * i + 1])
                      for i in range(n_pairs))
        tail = tuple(rows[2 * n_pairs:])
        out_s = jax.lax.sort((ids.astype(jnp.uint32),) + pairs + tail, num_keys=1)
        unpacked = []
        for p in out_s[1:1 + n_pairs]:
            unpacked += [jnp.real(p), jnp.imag(p)]
        unpacked += list(out_s[1 + n_pairs:])
        sorted_ops = (out_s[0],) + tuple(unpacked)
    ids_s = sorted_ops[0].astype(jnp.int32)
    # ONE packed array -> one DMA per macro step (see module docstring): row 0 is
    # the ids as exact f32, rows 1..1+F the sorted gradient rows, padded to a
    # multiple of 8 sublanes (Mosaic slice-alignment requirement).
    f_dma = ((1 + f_used + 7) // 8) * 8
    m = d // MACRO
    lanes = [ids_s.astype(jnp.float32)] + list(sorted_ops[1:])
    lanes += [jnp.zeros((d,), jnp.float32)] * (f_dma - len(lanes))
    packed = jnp.stack([r.reshape(m, MACRO) for r in lanes], axis=1)

    # Macro-aligned entry range per output block: with sorted ids, block b's
    # entries are [cum_last[b-1], cum_last[b]) where cum_last = searchsorted of the
    # block boundaries — only n_blocks binary searches (a 4.8M-slot scatter-max
    # formulation of the same thing measured 45ms on v5e; this is ~3ms). Ranges are
    # rounded outward to macro boundaries — overlap into neighbors is masked by the
    # one-hot.
    bounds = jnp.arange(1, n_blocks + 1, dtype=jnp.uint32) * jnp.uint32(block)
    cum_last = jnp.searchsorted(sorted_ops[0], bounds, side="left").astype(jnp.int32)
    prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum_last[:-1]])
    starts_m = prev // MACRO
    uppers_m = (cum_last + MACRO - 1) // MACRO
    uppers_m = jnp.maximum(uppers_m, starts_m)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((block, f_pad), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 1, f_dma, MACRO), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_kernel, block=block, f_used=f_used, f_pad=f_pad,
                               f_dma=f_dma, passes=passes)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f_pad), jnp.float32),
        interpret=interpret,
    )(starts_m, uppers_m, packed)
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
