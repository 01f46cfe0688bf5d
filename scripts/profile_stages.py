"""Stage-level timing of the 1M-Gaussian fwd+bwd bench on the real TPU.

Times each pipeline stage in isolation (jitted, with donated/blocked boundaries) so
the next optimization target is obvious. Not part of the test suite.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build
from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
from relightable3dgaussians_w_tpu.ops.rasterize import (
    rasterize, _gather_features_t)
from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
    PallasCompositeConfig, composite_tiles_pallas)


from scripts.tputime import timeit  # noqa: E402  (pull-based: axon-safe)


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    bg = jnp.zeros(3, jnp.float32)
    num_tiles = cfg.grid_x * cfg.grid_y
    print(f"n={n} res={W} max_dup={cfg.max_dup}")

    pre_f = jax.jit(lambda m, s, q: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None))
    pre, t_pre = timeit(pre_f, means, scales, quats, name="preprocess")

    bin_f = jax.jit(lambda p: bin_gaussians_aligned(p, cfg.grid_x, cfg.grid_y,
                                                    cfg.max_dup, cfg.pallas_chunk))
    aligned, t_al = timeit(bin_f, pre, name="bin_gaussians_aligned (one sort)")
    t_bin = 0.0

    gath_f = jax.jit(lambda p, a, o, c: _gather_features_t(p, a, o, c, None))
    feat_t, t_g = timeit(gath_f, pre, aligned, opac, colors, name="gather_features_t")

    pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                 channels=3, tile=cfg.tile, chunk=cfg.pallas_chunk)
    fwd_f = jax.jit(lambda f, s, c: composite_tiles_pallas(f, s, c, bg, pcfg))
    (tiles_rgb, tiles_tfin), t_f = timeit(
        fwd_f, feat_t, aligned.tile_start, aligned.tile_count, name="pallas fwd composite")

    def comp_loss(f):
        r, tf = composite_tiles_pallas(f, aligned.tile_start, aligned.tile_count, bg, pcfg)
        return jnp.sum(r) + jnp.sum(tf)
    comp_g = jax.jit(jax.grad(comp_loss))
    _, t_cb = timeit(comp_g, feat_t, name="pallas fwd+bwd composite")

    # Full fwd.
    fwd_full = jax.jit(lambda a: rasterize(*a, bg, cam, cfg))
    _, t_ff = timeit(fwd_full, arrs, name="FULL forward")

    def loss_fn(m, s, q, o, c):
        img, aux = rasterize(m, s, q, o, c, bg, cam, cfg)
        return jnp.sum(img) + jnp.sum(aux.alpha)
    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))
    _, t_full = timeit(step, *arrs, name="FULL fwd+bwd")

    # Grad through gather+composite only (freeze binning): isolates segment-sum bwd.
    def loss2(o, c):
        f = _gather_features_t(pre, aligned, o, c, None)
        r, tf = composite_tiles_pallas(f, aligned.tile_start, aligned.tile_count, bg, pcfg)
        return jnp.sum(r) + jnp.sum(tf)
    g2 = jax.jit(jax.grad(loss2, argnums=(0, 1)))
    _, t_g2 = timeit(g2, opac, colors, name="gather+composite fwd+bwd")

    print(f"\nsum of stages (fwd): {t_pre+t_al+t_g+t_f:.1f} ms vs full fwd {t_ff:.1f}")
    print(f"full fwd+bwd: {t_full:.1f} ms")


if __name__ == "__main__" and not os.environ.get("PROFILE_EXTRA"):
    main()


def extra():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    bg = jnp.zeros(3, jnp.float32)

    def loss_fn(m, s, q, o, c):
        img, aux = rasterize(m, s, q, o, c, bg, cam, cfg)
        return jnp.sum(img) + jnp.sum(aux.alpha)

    for argnums, name in [((4,), "grad wrt colors only"),
                          ((3, 4), "grad wrt opac+colors"),
                          ((0,), "grad wrt means only"),
                          ((0, 1, 2), "grad wrt means+scales+quats"),
                          ((0, 1, 2, 3, 4), "grad wrt all 5")]:
        step = jax.jit(jax.grad(loss_fn, argnums=argnums))
        timeit(step, *arrs, name=name)


if __name__ == "__main__" and os.environ.get("PROFILE_EXTRA"):
    extra()
