"""r2 experiment batch A: sort payload packing + preprocess-bwd residual probe."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tputime import timeit  # noqa: E402


def sort_experiments():
    d = 2_450_000
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 1 << 31, d).astype(np.uint32))
    rows = [jnp.asarray(rng.rand(d).astype(np.float32)) for _ in range(10)]

    f = jax.jit(lambda k, *rs: jax.lax.sort((k,) + rs, num_keys=1))
    timeit(f, key, *rows[:9], name="sort u32 key + 9 f32 payloads")

    def packed(k, *rs):
        pairs = [jax.lax.complex(rs[2 * i], rs[2 * i + 1]) for i in range(4)]
        out = jax.lax.sort((k,) + tuple(pairs) + (rs[8],), num_keys=1)
        outs = []
        for p in out[1:5]:
            outs += [jnp.real(p), jnp.imag(p)]
        return out[0], outs, out[5]
    f2 = jax.jit(packed)
    timeit(f2, key, *rows[:9], name="sort u32 key + 4 c64 + 1 f32 (pack+unpack)")

    f3 = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1))
    timeit(f3, key, rows[0], name="sort u32 key + 1 payload (2.45M)")


def preprocess_bwd_probe():
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess

    n = 1_000_000
    arrs, cam, cfg = build(n, 800, 800)
    means, scales, quats, opac, colors = arrs

    def pre_loss(m, s, q, o):
        pre = preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                         cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                         cfg.scale_modifier, None, None, o)
        return (jnp.sum(pre.mean2d) + jnp.sum(pre.conic) + jnp.sum(pre.depth)
                + jnp.sum(pre.tiles_touched.astype(jnp.float32)))

    timeit(jax.jit(pre_loss), means, scales, quats, opac, name="preprocess fwd (loss)")
    timeit(jax.jit(jax.grad(pre_loss, argnums=(0, 1, 2, 3))), means, scales, quats,
           opac, name="preprocess fwd+bwd (autodiff)")


def grad_gather_probe():
    """Gradient through preprocess+binning+gather WITHOUT compositing: isolates the
    gather-transpose (segment-sum) + preprocess VJP from the composite kernels, to
    locate the ~18ms that appears only when means/scales/quats require grads."""
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.rasterize import _gather_features_t

    n = 1_000_000
    arrs, cam, cfg = build(n, 800, 800)
    means, scales, quats, opac, colors = arrs

    def loss(m, s, q, o, c):
        pre = preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                         cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                         cfg.scale_modifier, None, None, o)
        aligned = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup,
                                        min(cfg.align_chunk, cfg.pallas_chunk),
                                        slack=cfg.pallas_chunk)
        feat_t = _gather_features_t(pre, aligned, o, c, None)
        return jnp.sum(feat_t * jnp.sin(jnp.arange(feat_t.shape[1]) * 0.1)[None, :])

    timeit(jax.jit(loss), *arrs, name="pre+bin+gather fwd")
    timeit(jax.jit(jax.grad(loss, argnums=(3, 4))), *arrs,
           name="pre+bin+gather grad wrt opac+colors")
    timeit(jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4))), *arrs,
           name="pre+bin+gather grad wrt all 5")


def staged_pre_probe():
    """Does the ~15ms means-chain tax vanish when preprocess outputs enter the
    binning/gather graph as PROGRAM PARAMETERS instead of expressions? (The same
    XLA scheduling pathology train_step.split_dispatch works around.)"""
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.rasterize import _gather_features_t

    n = 1_000_000
    arrs, cam, cfg = build(n, 800, 800)
    means, scales, quats, opac, colors = arrs

    def w_of(feat_t):
        # Distinct per-row weights: 9 IDENTICAL gradient payload rows get CSE'd
        # by XLA and undercount the segment-sum sort (first probe's flaw).
        r = jnp.arange(feat_t.shape[0], dtype=jnp.float32)[:, None]
        c = jnp.arange(feat_t.shape[1], dtype=jnp.float32)[None, :]
        return jnp.sin(c * 0.1 + r)

    pre_f = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))
    pre = pre_f(means, scales, quats, opac)

    def loss_staged(mean2d, conic, o, c):
        p = pre._replace(mean2d=mean2d, conic=conic)
        aligned = bin_gaussians_aligned(p, cfg.grid_x, cfg.grid_y, cfg.max_dup,
                                        min(cfg.align_chunk, cfg.pallas_chunk),
                                        slack=cfg.pallas_chunk)
        feat_t = _gather_features_t(p, aligned, o, c, None)
        return jnp.sum(feat_t * w_of(feat_t))

    g_staged = jax.jit(jax.grad(loss_staged, argnums=(0, 1, 2, 3)))
    timeit(g_staged, pre.mean2d, pre.conic, opac, colors,
           name="STAGED bin+gather grad wrt (mean2d, conic, op, colors)")

    def loss_fused(m, s, q, o, c):
        pre = preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                         cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                         cfg.scale_modifier, None, None, o)
        aligned = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup,
                                        min(cfg.align_chunk, cfg.pallas_chunk),
                                        slack=cfg.pallas_chunk)
        feat_t = _gather_features_t(pre, aligned, o, c, None)
        return jnp.sum(feat_t * w_of(feat_t))

    timeit(jax.jit(jax.grad(loss_fused, argnums=(3, 4))), *arrs,
           name="FUSED  bin+gather grad wrt (op, colors)")
    timeit(jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))), *arrs,
           name="FUSED  bin+gather grad wrt all 5")


def main():
    which = os.environ.get("EXP", "all")
    if which in ("all", "sort"):
        sort_experiments()
    if which in ("all", "pre"):
        preprocess_bwd_probe()
    if which in ("all", "gradgather"):
        grad_gather_probe()
    if which in ("all", "stagedpre"):
        staged_pre_probe()


if __name__ == "__main__":
    main()
