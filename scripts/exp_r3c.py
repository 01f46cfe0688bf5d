"""r3 experiment batch C: land/verify the measured trims.

  - tile_histogram: transpose-free [grid, N] mask layout (old vs new)
  - composite chunk=1024 (512 won batch B; check the next doubling)
  - segment-sum kernel block=512 vs 1024 vs 2048 (presorted, isolates kernel)
  - split bench stages p1/p2/p3 itemized at chunk=512
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
    from relightable3dgaussians_w_tpu.ops.binning import (
        bin_gaussians_aligned, tile_histogram)
    from relightable3dgaussians_w_tpu.ops.rasterize import (
        _gather_features_t, make_rasterize_grad_split)
    from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
        PallasCompositeConfig, composite_tiles_pallas)
    from relightable3dgaussians_w_tpu.ops.pallas.segment_sum import segment_sum_rows

    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    bg = jnp.zeros(3, jnp.float32)
    pre = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))(
        means, scales, quats, opac)
    which = os.environ.get("EXP", "hist,comp,seg,split").split(",")

    if "hist" in which:
        timeit(jax.jit(lambda p: tile_histogram(p, cfg.grid_x, cfg.grid_y)), pre,
               name="tile_histogram NEW layout")

    if "comp" in which:
        for chunk in (512, 1024):
            aligned = jax.jit(lambda p: bin_gaussians_aligned(
                p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=chunk))(pre)
            feat_t = jax.jit(lambda p, a, o, c: _gather_features_t(p, a, o, c, None))(
                pre, aligned, opac, colors)
            pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                         channels=3, tile=cfg.tile, chunk=chunk,
                                         align=128)

            def loss(f):
                r, tf = composite_tiles_pallas(f, aligned.tile_start,
                                               aligned.tile_count, bg, pcfg)
                return jnp.sum(r) + jnp.sum(tf)
            timeit(jax.jit(jax.grad(loss)), feat_t,
                   name=f"composite fwd+bwd chunk={chunk}")

    if "seg" in which:
        aligned = jax.jit(lambda p: bin_gaussians_aligned(
            p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=512))(pre)
        d = aligned.gauss_id.shape[0]
        rng = np.random.RandomState(1)
        rows = [jnp.asarray(rng.rand(d).astype(np.float32)) for _ in range(9)]
        gid = aligned.gauss_id
        sorted_all = jax.jit(lambda g, *rs: jax.lax.sort(
            (g.astype(jnp.uint32),) + rs, num_keys=1))(gid, *rows)
        gid_s = sorted_all[0].astype(jnp.int32)
        rows_s = list(sorted_all[1:])
        for block in (512, 1024, 2048):
            timeit(jax.jit(lambda g, *rs: segment_sum_rows(
                rs, g, n, block=block, presorted=True)), gid_s, *rows_s,
                name=f"segsum kernel presorted block={block}")

    if "split" in which:
        def img_loss(img, aux):
            return jnp.sum(img) + jnp.sum(aux.alpha)

        split_step = make_rasterize_grad_split(cam, cfg, img_loss)
        timeit(lambda *a: split_step(*a, bg)[1], *arrs,
               name=f"split bench TOTAL chunk={cfg.pallas_chunk}")


if __name__ == "__main__":
    main()
