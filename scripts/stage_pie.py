"""Measured stage pie of the rasterizer fwd+bwd pipeline (importable by bench.py).

Each stage is timed as an ISOLATED jitted program with a pull-based read-back
(scripts/tputime.timeit, axon-safe). The pie is the externally-legible form of
BENCH_LOG's roofline attribution: how the end-to-end iteration decomposes into
XLA-primitive floors (sort/gather/segment-sum), Pallas kernel time, and
scheduling overhead. sol_pct = (sum of isolated stage floors) / e2e — 1.0 means
the pipeline runs at its own decomposed speed-of-light with zero scheduling
waste (VERDICT r4 item 3a).
"""

import jax
import jax.numpy as jnp


def measure_stage_pie(arrs, cam, cfg, bg, mode="train"):
    """Returns dict of stage -> ms. arrs/cam/cfg as produced by bench.build."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from relightable3dgaussians_w_tpu.ops.preprocess import (
        preprocess, row_intervals)
    from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned
    from relightable3dgaussians_w_tpu.ops.rasterize import _gather_features_t
    from relightable3dgaussians_w_tpu.ops.pallas.wrapper import (
        PallasCompositeConfig, composite_tiles_pallas)
    from scripts.tputime import timeit

    means, scales, quats, opac, colors = arrs
    align = min(cfg.align_chunk, cfg.pallas_chunk)

    pre_f = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))
    pre, t_pre = timeit(pre_f, means, scales, quats, opac, name="preprocess",
                        quiet=True)

    def bin_fn(p, o):
        iv = row_intervals(p, o, cfg.tile) if cfg.row_intervals else None
        return bin_gaussians_aligned(p, cfg.grid_x, cfg.grid_y, cfg.max_dup,
                                     align, slack=cfg.pallas_chunk,
                                     intervals=iv)

    aligned, t_bin = timeit(jax.jit(bin_fn), pre, opac, name="binning",
                            quiet=True)

    packed = bool(getattr(cfg, "packed_rgb", False))
    gath_f = jax.jit(lambda p, a, o, c: _gather_features_t(
        p, a, o, c, None, packed_rgb=packed))
    feat_t, t_g = timeit(gath_f, pre, aligned, opac, colors, name="gather",
                         quiet=True)

    pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                 channels=colors.shape[-1], tile=cfg.tile,
                                 chunk=cfg.pallas_chunk, align=align,
                                 tiles_per_step=cfg.tiles_per_step,
                                 packed_rgb=packed)
    fwd_f = jax.jit(lambda f, s, c: composite_tiles_pallas(f, s, c, bg, pcfg))
    _, t_cf = timeit(fwd_f, feat_t, aligned.tile_start, aligned.tile_count,
                     name="composite_fwd", quiet=True)

    pie = {
        "preprocess": t_pre,
        "binning": t_bin,
        "gather": t_g,
        "composite_fwd": t_cf,
    }
    if mode != "train":
        return pie

    def comp_loss(f):
        r, tf = composite_tiles_pallas(f, aligned.tile_start,
                                       aligned.tile_count, bg, pcfg)
        return jnp.sum(r) + jnp.sum(tf)

    _, t_cfb = timeit(jax.jit(jax.grad(comp_loss)), feat_t,
                      name="composite_fwd+bwd", quiet=True)

    def loss2(o, c):
        f = _gather_features_t(pre, aligned, o, c, None)
        r, tf = composite_tiles_pallas(f, aligned.tile_start,
                                       aligned.tile_count, bg, pcfg)
        return jnp.sum(r) + jnp.sum(tf)

    _, t_g2 = timeit(jax.jit(jax.grad(loss2, argnums=(0, 1))), opac, colors,
                     name="gather+composite fwd+bwd", quiet=True)

    pie["composite_bwd"] = max(t_cfb - t_cf, 0.0)
    # gradient route back through the gather: segment reduction over entries
    pie["segsum_grads"] = max(t_g2 - t_cfb - t_g, 0.0)
    return pie


def sol_pct(pie: dict, e2e_ms: float, preproc_vjp_ms: float | None = None):
    """Fraction of the e2e iteration accounted for by the isolated stage
    floors. The preprocess VJP is not separately isolatable (it rides the
    input-chain dispatch); when not provided it is taken as the residual and
    EXCLUDED from the floor sum, making sol_pct conservative."""
    floor = sum(pie.values()) + (preproc_vjp_ms or 0.0)
    return min(floor / max(e2e_ms, 1e-9), 1.0)
