"""r4 probe G: what binds the composite forward at ~15 ms (vs 6.6 VPU SoL)?

exp_r4f showed the three per-pair transcendentals cost ~nothing (stubbing
log/exp moved 14.93 -> 14.94 ms) and a linear-space doubling scan is WORSE
(22.7). So the binder is one of:
  (a) MXU matmul call count/overhead (4 x [512,128]x[128,128] prefix blocks +
      1 color contraction per chunk, ~17k small matmuls per pass)
  (b) the serial chunk->chunk dependency chain (praw carry forces each chunk's
      matmuls+VPU to complete before the next starts; ~3.5k sequential steps)
  (c) raw VPU pass count over [P, CHUNK] intermediates

Variants (wrong math where noted — timing bounds only):
  base       current kernel math
  noprefix   excl := 0            [removes 4 prefix matmuls/chunk + latency]
  bigmm      one [2P,512]x[512,512] prefix matmul per chunk (correct math,
             4x the MXU flops, 1/4 the matmul calls)
  noacc      color contraction removed
  novpu      alpha := op * 1e-3 broadcast (minimal VPU work; keeps both
             matmul sites + loop structure)

Run: python scripts/exp_r4g.py  (TPU)
"""

import functools
import os
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build
from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
from relightable3dgaussians_w_tpu.ops.rasterize import _gather_features_t
from relightable3dgaussians_w_tpu.ops.pallas.tile_composite import (
    _chunk_alpha, _prefix_exact, _dot_exact_rhs, _triu, _contract_lanes,
    NEG_LOG_EPS)
from relightable3dgaussians_w_tpu.ops.composite import T_EPS
from scripts.tputime import timeit


def _fwd_kernel_var(starts_ref, counts_ref, feat_hbm, out_ref, tfin_ref,
                    scratch, sems, *, tile, chunk, channels, f_pad, grid_x,
                    align, tb, mode):
    P = tile * tile
    for j in range(tb):
        t = pl.program_id(0) * tb + j
        tx = t % grid_x
        ty = t // grid_x
        start = starts_ref[t]
        count = counts_ref[t]
        n_chunks = pl.cdiv(count, chunk)
        px0 = (tx * tile).astype(jnp.float32)
        py0 = (ty * tile).astype(jnp.float32)

        def get_dma(slot, c_idx, start=start):
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(start + c_idx * chunk, align), chunk)],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(carry, count=count, n_chunks=n_chunks, px0=px0, py0=py0,
                 get_dma=get_dma):
            c_idx, _, log_praw, acc, log_tfin = carry
            slot = jnp.remainder(c_idx, 2)
            get_dma(slot, c_idx).wait()
            rows = scratch[slot]
            valid_len = count - c_idx * chunk
            if mode == "novpu":
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
                alpha = jnp.where(lane >= valid_len, 0.0,
                                  rows[5:6, :] * 1e-3) * jnp.ones((P, 1), jnp.float32)
            else:
                alpha, _ = _chunk_alpha(rows, valid_len, tile, px0, py0, chunk)
            log1m = jnp.log(1.0 - alpha)
            log_praw_new = jnp.maximum(
                log_praw + jnp.sum(log1m, axis=1, keepdims=True), NEG_LOG_EPS)
            cont = (c_idx + 1 < n_chunks) & (jnp.max(log_praw_new) >= jnp.log(T_EPS))

            @pl.when(cont)
            def _():
                get_dma(jnp.remainder(c_idx + 1, 2), c_idx + 1).start()

            if mode == "noprefix":
                excl = log_praw * jnp.ones((1, chunk), jnp.float32)
            elif mode == "bigmm":
                excl = _dot_exact_rhs(log1m, _triu(chunk, True)) + log_praw
            else:
                excl = _prefix_exact(log1m, True) + log_praw
            log_p_inc = excl + log1m
            include = log_p_inc >= jnp.log(T_EPS)
            w = jnp.where(include, alpha * jnp.exp(excl), 0.0)

            colors = rows[6 : 6 + channels, :]
            if mode == "noacc":
                acc = acc + jnp.sum(w, axis=1, keepdims=True)
            else:
                acc = acc + _contract_lanes(w, colors)
            log_tfin = log_tfin + jnp.sum(jnp.where(include, log1m, 0.0),
                                          axis=1, keepdims=True)
            return c_idx + 1, cont, log_praw_new, acc, log_tfin

        def cond(carry):
            return carry[1]

        c_out = 1 if mode == "noacc" else channels
        init = (jnp.int32(0), n_chunks > 0, jnp.zeros((P, 1), jnp.float32),
                jnp.zeros((P, c_out), jnp.float32), jnp.zeros((P, 1), jnp.float32))
        _, _, _, acc, log_tfin = jax.lax.while_loop(cond, body, init)
        if mode == "noacc":
            out_ref[j] = acc * jnp.ones((1, channels), jnp.float32)
        else:
            out_ref[j] = acc
        tfin_ref[j] = jnp.exp(log_tfin)


def run_variant(mode, feat_t, tile_start, tile_count, *, grid_x, grid_y,
                channels, tile, chunk, align, tb):
    f_pad, D = feat_t.shape
    num_tiles = grid_x * grid_y
    P = tile * tile
    t_pad = ((num_tiles + tb - 1) // tb) * tb
    if t_pad != num_tiles:
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros((t_pad - num_tiles,), tile_start.dtype)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros((t_pad - num_tiles,), tile_count.dtype)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tb, P, channels), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel_var, tile=tile, chunk=chunk,
                               channels=channels, f_pad=f_pad, grid_x=grid_x,
                               align=align, tb=tb, mode=mode)
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, P, channels), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, P, 1), jnp.float32),
        ],
    )
    return jax.jit(lambda s, c, f: fn(s, c, f))


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    chunk = cfg.pallas_chunk
    align = min(cfg.align_chunk, chunk)
    tb = cfg.tiles_per_step
    print(f"n={n} res={W} chunk={chunk} align={align} tb={tb}", flush=True)

    pre = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))(
            means, scales, quats, opac)
    aligned = jax.jit(lambda p: bin_gaussians_aligned(
        p, cfg.grid_x, cfg.grid_y, cfg.max_dup, align, slack=chunk))(pre)
    feat_t = jax.jit(lambda p, a, o, c: _gather_features_t(p, a, o, c, None))(
        pre, aligned, opac, colors)
    feat_t = jax.block_until_ready(feat_t)

    import numpy as np
    outs = {}
    import os as _os
    for mode in _os.environ.get("R4G_MODES", "base,bigmm,noacc,noprefix,novpu").split(","):
        fn = run_variant(mode, feat_t, aligned.tile_start, aligned.tile_count,
                         grid_x=cfg.grid_x, grid_y=cfg.grid_y, channels=3,
                         tile=cfg.tile, chunk=chunk, align=align, tb=tb)
        out, dt = timeit(fn, aligned.tile_start, aligned.tile_count, feat_t,
                         name=f"fwd variant {mode}")
        outs[mode] = (out, dt)

    if "base" in outs and "bigmm" in outs:
        rgb_b = np.asarray(outs["base"][0][0])
        rgb_m = np.asarray(outs["bigmm"][0][0])
        print(f"bigmm vs base rgb max abs {np.abs(rgb_m-rgb_b).max():.3e}", flush=True)


if __name__ == "__main__":
    main()
