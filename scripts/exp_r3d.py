"""r3 experiment batch D: composite grid-overhead probe + split-stage itemization.

The composite fwd+bwd measures 38 ms vs a ~10-12 ms VPU+MXU floor. Hypothesis:
per-grid-step fixed cost (manual DMA issue+wait latency per tile, 2500 steps x
fwd+bwd) — measured here by compositing a buffer whose tile counts are ZERO
(kernel does nothing per step) and, separately, with all entries packed into few
tiles (same pair count, 16x fewer steps).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tputime import timeit  # noqa: E402


def main():
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.rasterize import (
        _gather_features_t, make_rasterize_grad_split)
    from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
        PallasCompositeConfig, composite_tiles_pallas)

    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    bg = jnp.zeros(3, jnp.float32)
    chunk = 512
    num_tiles = cfg.grid_x * cfg.grid_y

    pre = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))(
        means, scales, quats, opac)
    aligned = jax.jit(lambda p: bin_gaussians_aligned(
        p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=chunk))(pre)
    feat_t = jax.jit(lambda p, a, o, c: _gather_features_t(p, a, o, c, None))(
        pre, aligned, opac, colors)
    pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                 channels=3, tile=cfg.tile, chunk=chunk, align=128)

    # 1. Zero-count tiles: pure per-grid-step overhead (2500 steps, no chunks).
    zero_counts = jnp.zeros_like(aligned.tile_count)
    f = jax.jit(lambda ft, s, c: composite_tiles_pallas(ft, s, c, bg, pcfg))
    timeit(f, feat_t, aligned.tile_start, zero_counts,
           name="composite fwd ZERO counts (grid overhead)")

    def loss(ft, s, c):
        r, tf = composite_tiles_pallas(ft, s, c, bg, pcfg)
        return jnp.sum(r) + jnp.sum(tf)
    timeit(jax.jit(jax.grad(loss, argnums=0)), feat_t, aligned.tile_start,
           zero_counts, name="composite fwd+bwd ZERO counts")

    # 2. One-chunk-per-tile (count=chunk): fixed work per step, measures
    #    step-latency vs compute scaling. Total pairs = 2500 * 256 * 512 = 328M.
    one_counts = jnp.full_like(aligned.tile_count, chunk)
    starts = jnp.arange(num_tiles, dtype=jnp.int32) * chunk
    timeit(f, feat_t, starts, one_counts, name="composite fwd count=chunk each")
    timeit(jax.jit(jax.grad(loss, argnums=0)), feat_t, starts, one_counts,
           name="composite fwd+bwd count=chunk each")

    # 3. Split-stage itemization at bench shapes.
    def img_loss(img, aux):
        return jnp.sum(img) + jnp.sum(aux.alpha)

    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    @jax.jit
    def p1f(m, s, q, o):
        return preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                          cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                          cfg.scale_modifier, None, None, o)

    pre_b = p1f(means, scales, quats, opac)
    timeit(p1f, means, scales, quats, opac, name="split P1 preprocess fwd")

    @jax.jit
    def p2f(pre, m, o, c):
        def fx(mean2d, conic, op, cols):
            p = pre._replace(mean2d=mean2d, conic=conic)
            img, aux = rasterize(m, None, None, op, cols, bg, cam, cfg, pre=p)
            return img_loss(img, aux)
        return jax.value_and_grad(fx, argnums=(0, 1, 2, 3))(
            pre.mean2d, pre.conic, o, c)

    (_, grads2) = p2f(pre_b, means, opac, colors)
    timeit(p2f, pre_b, means, opac, colors, name="split P2 bin+gather+composite grad")

    @jax.jit
    def p3f(m, s, q, o, dm, dc):
        def fx(mm, ss, qq):
            p = preprocess(mm, ss, qq, cam.viewmat, cam.projmat, cam.tan_fovx,
                           cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                           cfg.scale_modifier, None, None, o)
            return p.mean2d, p.conic
        _, vjp = jax.vjp(fx, m, s, q)
        return vjp((dm, dc))

    timeit(p3f, means, scales, quats, opac, grads2[0], grads2[1],
           name="split P3 preprocess VJP")


if __name__ == "__main__":
    main()
