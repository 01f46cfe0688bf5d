"""r4 probe F: where does the composite pair's time sit — transcendentals or not?

The r4 roofline close-out left the composite fwd+bwd (~35 ms of the 103 ms iter)
as the only stage with headroom (fwd 15 vs 6.6 ms VPU SoL, bwd 20 vs 9). Per
pixel-entry pair the kernel evaluates THREE transcendentals: exp(power) -> G,
log(1 - alpha) for the log-space transmittance prefix, and exp(excl) to get the
blending weight back. The prefix itself could instead run as a LINEAR-SPACE
doubling scan over lanes (9 shifted multiplies for a 512-chunk), removing
log(1-alpha) and exp(excl) entirely (exp(power) must stay: the power > 0 and
alpha < 1/255 skip predicates demand the twin's exact VPU op order, CLAUDE.md).

Variants timed at bench scale (1M Gaussians, 800^2, chunk 512, tb=4):
  base         exact current forward kernel math (log-space prefix)
  stub         log1m := -alpha, w := alpha*(1+excl)  [WRONG MATH — timing bound
               on "both prefix transcendentals cost"]
  linear       real linear-space doubling-scan transmittance (candidate)
  linear_noG   linear + exp(power) stubbed to power+1  [WRONG MATH — bound]

Run: python scripts/exp_r4f.py  (TPU; one process, all variants batched)
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
from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
    PallasCompositeConfig, composite_tiles_pallas)
from relightable3dgaussians_w_tpu.ops.pallas.tile_composite import (
    _chunk_alpha, _prefix_exact, _contract_lanes, NEG_LOG_EPS)
from relightable3dgaussians_w_tpu.ops.composite import T_EPS
from scripts.tputime import timeit


def _excl_prod_scan(om):
    """Exclusive prefix product along lanes via doubling: [P, L] f32."""
    P, L = om.shape
    ones = jnp.ones((P, 1), jnp.float32)
    # exclusive shift by 1 first, then inclusive doubling of the shifted array
    x = jnp.concatenate([ones, om[:, : L - 1]], axis=1)
    k = 1
    while k < L:
        pad = jnp.ones((P, k), jnp.float32)
        x = x * jnp.concatenate([pad, x[:, : L - k]], axis=1)
        k *= 2
    return x


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
            c_idx, _, praw, acc, tfin = carry
            slot = jnp.remainder(c_idx, 2)
            get_dma(slot, c_idx).wait()
            rows = scratch[slot]
            valid_len = count - c_idx * chunk
            alpha, _ = _chunk_alpha(rows, valid_len, tile, px0, py0, chunk)

            if mode in ("base", "stub"):
                # praw/tfin carried in LOG space
                log1m = jnp.log(1.0 - alpha) if mode == "base" else -alpha
                praw_new = jnp.maximum(
                    praw + jnp.sum(log1m, axis=1, keepdims=True), NEG_LOG_EPS)
                cont = (c_idx + 1 < n_chunks) & (jnp.max(praw_new) >= jnp.log(T_EPS))

                @pl.when(cont)
                def _():
                    get_dma(jnp.remainder(c_idx + 1, 2), c_idx + 1).start()

                excl = _prefix_exact(log1m, True) + praw
                log_p_inc = excl + log1m
                include = log_p_inc >= jnp.log(T_EPS)
                if mode == "base":
                    w = jnp.where(include, alpha * jnp.exp(excl), 0.0)
                else:
                    w = jnp.where(include, alpha * (1.0 + excl), 0.0)
                tfin_new = tfin + jnp.sum(jnp.where(include, log1m, 0.0),
                                          axis=1, keepdims=True)
            else:
                # praw/tfin carried in LINEAR space
                om = 1.0 - alpha
                excl = _excl_prod_scan(om)                     # [P, CHUNK]
                total = excl[:, chunk - 1 :] * om[:, chunk - 1 :]
                praw_new = praw * total
                cont = (c_idx + 1 < n_chunks) & (jnp.max(praw_new) >= T_EPS)

                @pl.when(cont)
                def _():
                    get_dma(jnp.remainder(c_idx + 1, 2), c_idx + 1).start()

                p_prev = praw * excl
                p_inc = p_prev * om
                include = p_inc >= T_EPS
                w = jnp.where(include, alpha * p_prev, 0.0)
                # T_final over included entries: include is a prefix mask along
                # the depth order and p is nonincreasing, so the included
                # product equals the smallest included p_inc (or carries over).
                pi = jnp.where(include, p_inc, jnp.inf)
                tfin_new = jnp.minimum(tfin, jnp.min(pi, axis=1, keepdims=True))

            colors = rows[6 : 6 + channels, :]
            acc = acc + _contract_lanes(w, colors)
            return c_idx + 1, cont, praw_new, acc, tfin_new

        def cond(carry):
            return carry[1]

        if mode in ("base", "stub"):
            praw0 = jnp.zeros((P, 1), jnp.float32)
            tfin0 = jnp.zeros((P, 1), jnp.float32)
        else:
            praw0 = jnp.ones((P, 1), jnp.float32)
            tfin0 = jnp.ones((P, 1), jnp.float32)
        init = (jnp.int32(0), n_chunks > 0, praw0,
                jnp.zeros((P, channels), jnp.float32), tfin0)
        _, _, praw, acc, tfin = jax.lax.while_loop(cond, body, init)
        out_ref[j] = acc
        if mode in ("base", "stub"):
            tfin_ref[j] = jnp.exp(tfin)
        else:
            # min(inf carry) = no entry ever included -> praw (= product of all,
            # skips contribute 1). Matches the log path's sum-of-included form.
            tfin_ref[j] = jnp.where(jnp.isfinite(tfin), tfin, praw)


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
    bg = jnp.zeros(3, jnp.float32)
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

    # Reference: the production fwd through the public wrapper.
    pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                 channels=3, tile=cfg.tile, chunk=chunk,
                                 align=align, tiles_per_step=tb)
    prod_f = jax.jit(lambda f, s, c: composite_tiles_pallas(f, s, c, bg, pcfg))
    (rgb_ref, tfin_ref_), _ = timeit(prod_f, feat_t, aligned.tile_start,
                                     aligned.tile_count, name="production fwd")

    outs = {}
    for mode in ("base", "stub", "linear", "linear_noG"):
        fn = run_variant(mode, feat_t, aligned.tile_start, aligned.tile_count,
                         grid_x=cfg.grid_x, grid_y=cfg.grid_y, channels=3,
                         tile=cfg.tile, chunk=chunk, align=align, tb=tb)
        out, dt = timeit(fn, aligned.tile_start, aligned.tile_count, feat_t,
                         name=f"fwd variant {mode}")
        outs[mode] = (out, dt)

    # Correctness of the linear candidate vs the exact base variant.
    import numpy as np
    rgb_b = np.asarray(outs["base"][0][0])
    tf_b = np.asarray(outs["base"][0][1])
    rgb_l = np.asarray(outs["linear"][0][0])
    tf_l = np.asarray(outs["linear"][0][1])
    sc = max(np.abs(rgb_b).max(), 1e-9)
    print(f"linear vs base: rgb max abs {np.abs(rgb_l-rgb_b).max():.3e} "
          f"(rel {np.abs(rgb_l-rgb_b).max()/sc:.3e}), "
          f"tfin max abs {np.abs(tf_l-tf_b).max():.3e}", flush=True)
    rgb_p = np.asarray(rgb_ref)
    # production adds bg (zero here) and reshapes [T,P,C] identically
    print(f"base vs production: rgb max abs {np.abs(rgb_b-rgb_p).max():.3e}",
          flush=True)


if __name__ == "__main__":
    main()
