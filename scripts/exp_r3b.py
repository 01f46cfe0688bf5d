"""r3 experiment batch B: sub-stage breakdowns of binning / segment-sum / composite
at bench shapes, to target the next trims (roofline attack items b and c).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tputime import timeit  # noqa: E402


def setup():
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess

    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    pre_f = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))
    pre = pre_f(means, scales, quats, opac)
    return arrs, cam, cfg, pre


def binning_stages(arrs, cam, cfg, pre):
    import math
    from relightable3dgaussians_w_tpu.ops.binning import (
        bin_gaussians_aligned, tile_histogram)

    n = pre.depth.shape[0]
    counts = pre.tiles_touched.astype(jnp.int32)
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    rect_h = jnp.maximum(pre.rect_max[:, 1] - pre.rect_min[:, 1], 1)

    timeit(jax.jit(lambda p: tile_histogram(p, cfg.grid_x, cfg.grid_y)), pre,
           name="tile_histogram (matmul)")

    def depth_sort(depth, counts, rmin, rw, rh):
        depth_key = jnp.where(counts > 0, depth, jnp.inf)
        packed = (rmin[:, 0].astype(jnp.uint32)
                  | (rmin[:, 1].astype(jnp.uint32) << 7)
                  | (rw.astype(jnp.uint32) << 14)
                  | (rh.astype(jnp.uint32) << 21))
        return jax.lax.sort((depth_key, packed, jnp.arange(n, dtype=jnp.int32)),
                            num_keys=1, is_stable=True)

    timeit(jax.jit(depth_sort), pre.depth, counts, pre.rect_min, rect_w, rect_h,
           name="depth sort (f32 key + u32 + i32)")

    # The expand kernel alone (monotone join), via the aligned binning path with
    # the big sort removed is hard to isolate; instead time the full aligned
    # binning at two key sizes to infer the big-sort share.
    timeit(jax.jit(lambda p: bin_gaussians_aligned(
        p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=cfg.pallas_chunk)),
        pre, name="bin_gaussians_aligned FULL")

    # Big sort alone at the aligned size: u32 keys + i32 payload.
    from relightable3dgaussians_w_tpu.ops.pallas.segment_sum import MACRO
    d_aligned = ((cfg.max_dup + cfg.grid_x * cfg.grid_y * 128
                  + cfg.pallas_chunk + MACRO - 1) // MACRO) * MACRO
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randint(0, 1 << 31, d_aligned).astype(np.uint32))
    gids = jnp.asarray(rng.randint(0, n, d_aligned).astype(np.int32))
    timeit(jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1)), keys, gids,
           name=f"big sort u32+i32 at D={d_aligned}")
    timeit(jax.jit(lambda k: jax.lax.sort((k,), num_keys=1)[0]), keys,
           name="big sort u32 keys ONLY")


def segsum_stages(arrs, cam, cfg, pre):
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.pallas.segment_sum import (
        segment_sum_rows, MACRO)

    n = pre.depth.shape[0]
    aligned = jax.jit(lambda p: bin_gaussians_aligned(
        p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=cfg.pallas_chunk))(pre)
    d = aligned.gauss_id.shape[0]
    rng = np.random.RandomState(1)
    rows = [jnp.asarray(rng.rand(d).astype(np.float32)) for _ in range(9)]
    gid = aligned.gauss_id

    timeit(jax.jit(lambda g, *rs: segment_sum_rows(rs, g, n)), gid, *rows,
           name=f"segment_sum_rows 9 rows (sort path) D={d}")
    sorted_all = jax.jit(lambda g, *rs: jax.lax.sort((g.astype(jnp.uint32),) + rs,
                                                     num_keys=1))(gid, *rows)
    gid_s = sorted_all[0].astype(jnp.int32)
    rows_s = list(sorted_all[1:])
    timeit(jax.jit(lambda g, *rs: segment_sum_rows(rs, g, n, presorted=True)),
           gid_s, *rows_s, name="segment_sum_rows presorted (kernel only)")

    def packed_sort(g, *rs):
        pairs = tuple(jax.lax.complex(rs[2 * i], rs[2 * i + 1]) for i in range(4))
        return jax.lax.sort((g.astype(jnp.uint32),) + pairs + (rs[8],), num_keys=1)
    timeit(jax.jit(packed_sort), gid, *rows,
           name="id sort + 4 c64 + 1 f32 payload (sort only)")


def composite_variants(arrs, cam, cfg, pre):
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.rasterize import _gather_features_t
    from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
        PallasCompositeConfig, composite_tiles_pallas)

    means, scales, quats, opac, colors = arrs
    bg = jnp.zeros(3, jnp.float32)
    for chunk in (128, 256, 512):
        align = min(128, chunk)
        aligned = jax.jit(lambda p: bin_gaussians_aligned(
            p, cfg.grid_x, cfg.grid_y, cfg.max_dup, align, slack=chunk))(pre)
        feat_t = jax.jit(lambda p, a, o, c: _gather_features_t(p, a, o, c, None))(
            pre, aligned, opac, colors)
        pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                     channels=3, tile=cfg.tile, chunk=chunk,
                                     align=align)
        fwd = jax.jit(lambda f, s, c: composite_tiles_pallas(f, s, c, bg, pcfg))
        timeit(fwd, feat_t, aligned.tile_start, aligned.tile_count,
               name=f"composite fwd chunk={chunk}")

        def loss(f):
            r, tf = composite_tiles_pallas(f, aligned.tile_start,
                                           aligned.tile_count, bg, pcfg)
            return jnp.sum(r) + jnp.sum(tf)
        timeit(jax.jit(jax.grad(loss)), feat_t,
               name=f"composite fwd+bwd chunk={chunk}")


def gather_variants(arrs, cam, cfg, pre):
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned

    means, scales, quats, opac, colors = arrs
    aligned = jax.jit(lambda p: bin_gaussians_aligned(
        p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=cfg.pallas_chunk))(pre)
    gid = aligned.gauss_id
    n = means.shape[0]
    rng = np.random.RandomState(2)
    tab16 = jnp.asarray(rng.rand(n, 16).astype(np.float32))
    tab8 = jnp.asarray(rng.rand(n, 8).astype(np.float32))

    timeit(jax.jit(lambda t, g: t[g]), tab16, gid, name="row gather [N,16] no T")
    timeit(jax.jit(lambda t, g: t[g].T), tab16, gid, name="row gather [N,16] + T")
    timeit(jax.jit(lambda t, g: t[g]), tab8, gid, name="row gather [N,8] no T")


def main():
    arrs, cam, cfg, pre = setup()
    which = os.environ.get("EXP", "bin,seg,comp,gath").split(",")
    if "bin" in which:
        binning_stages(arrs, cam, cfg, pre)
    if "seg" in which:
        segsum_stages(arrs, cam, cfg, pre)
    if "comp" in which:
        composite_variants(arrs, cam, cfg, pre)
    if "gath" in which:
        gather_variants(arrs, cam, cfg, pre)


if __name__ == "__main__":
    main()
