"""r3 batch F: composite tiles_per_step sweep; EVEN-row segment-sum parity on
real TPU (ADVICE r2 low: the complex-payload packing changes sort permutation /
accumulation order — probe both parities); 4M-Gaussian scale probe.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tputime import timeit  # noqa: E402


def tb_sweep():
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.rasterize import _gather_features_t
    from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
        PallasCompositeConfig, composite_tiles_pallas)

    arrs, cam, cfg = build(1_000_000, 800, 800)
    means, scales, quats, opac, colors = arrs
    bg = jnp.zeros(3, jnp.float32)
    pre = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))(
        means, scales, quats, opac)
    aligned = jax.jit(lambda p: bin_gaussians_aligned(
        p, cfg.grid_x, cfg.grid_y, cfg.max_dup, 128, slack=512))(pre)
    feat_t = jax.jit(lambda p, a, o, c: _gather_features_t(p, a, o, c, None))(
        pre, aligned, opac, colors)
    for tb in (4, 8, 16):
        pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                     channels=3, tile=cfg.tile, chunk=512,
                                     align=128, tiles_per_step=tb)

        def loss(f):
            r, tf = composite_tiles_pallas(f, aligned.tile_start,
                                           aligned.tile_count, bg, pcfg)
            return jnp.sum(r) + jnp.sum(tf)
        timeit(jax.jit(jax.grad(loss)), feat_t,
               name=f"composite fwd+bwd tiles_per_step={tb}")


def even_rows_parity():
    """Rasterizer fwd+grad parity (pallas vs jnp twin) at C=4 -> f=10 gradient
    rows (EVEN; the bench's C=3 exercises the odd case). 512^2 / 50k on real
    TPU per the CLAUDE.md probe discipline."""
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    arrs, cam, cfg = build(50_000, 512, 512, seed=3)
    means, scales, quats, opac, colors3 = arrs
    rng = np.random.RandomState(9)
    colors = jnp.asarray(rng.uniform(0, 1, (50_000, 4)), jnp.float32)
    bg = jnp.zeros(4, jnp.float32)

    def loss(m, s, q, o, c, use_pallas):
        img, aux = rasterize(m, s, q, o, c, bg, cam,
                             cfg._replace(use_pallas=use_pallas))
        w = jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape) * 1e-6
        return jnp.sum(img * w) + jnp.sum(aux.alpha)

    gp = jax.jit(jax.grad(lambda *a: loss(*a, True), argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, opac, colors)
    gj = jax.jit(jax.grad(lambda *a: loss(*a, False), argnums=(0, 1, 2, 3, 4)))(
        means, scales, quats, opac, colors)
    names = ["means", "scales", "quats", "opac", "colors"]
    ok = True
    for a, b, nm in zip(gp, gj, names):
        a, b = np.asarray(a), np.asarray(b)
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-12)
        print(f"even-rows parity {nm:8s} rel={rel:.3e}")
        ok &= rel < 1e-3
    print("even-rows parity OK" if ok else "even-rows parity FAILED")


def scale_4m():
    os.environ["BENCH_N"] = "4000000"
    from bench import main as bench_main

    bench_main()


def main():
    which = os.environ.get("EXP", "tb,even,scale4m").split(",")
    if "tb" in which:
        tb_sweep()
    if "even" in which:
        even_rows_parity()
    if "scale4m" in which:
        scale_4m()


if __name__ == "__main__":
    main()
