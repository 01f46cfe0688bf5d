"""custom_vjp wrapper around the Pallas tile-compositing kernels."""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .tile_composite import composite_forward_pallas, composite_backward_pallas


class PallasCompositeConfig(NamedTuple):
    grid_x: int
    grid_y: int
    channels: int
    tile: int = 16
    chunk: int = 256
    interpret: bool = False
    align: int = 256   # tile-segment alignment quantum (<= chunk, multiple of 128)
    tiles_per_step: int = 4  # tiles per Pallas grid step (amortizes ~2.2us/step)
    packed_rgb: bool = False  # SERVING: rows 6/7 = (packed 12-bit R|B, exact G)
                              # — fwd-only; the VJP refuses it (tile_composite.py
                              # pack_rb)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def composite_tiles_pallas(feat_t, tile_start, tile_count, bg, cfg: PallasCompositeConfig):
    """feat_t: [F_pad, D_aligned]; returns (tiles_rgb [T, P, C], tiles_tfin [T, P])."""
    return composite_forward_pallas(
        feat_t, tile_start, tile_count, bg,
        grid_x=cfg.grid_x, grid_y=cfg.grid_y, channels=cfg.channels, tile=cfg.tile,
        chunk=cfg.chunk, interpret=cfg.interpret, align=cfg.align,
        tiles_per_step=cfg.tiles_per_step, packed_rgb=cfg.packed_rgb,
    )


def _fwd(feat_t, tile_start, tile_count, bg, cfg):
    out = composite_tiles_pallas(feat_t, tile_start, tile_count, bg, cfg)
    return out, (feat_t, tile_start, tile_count, bg, out[0], out[1])


def _bwd(cfg, res, cots):
    if cfg.packed_rgb:
        raise NotImplementedError(
            "packed_rgb is a forward-only serving mode (quantized color rows "
            "carry no gradient contract); train with packed_rgb=False")
    feat_t, tile_start, tile_count, bg, tiles_rgb, tiles_tfin = res
    g_tiles, g_tfin = cots
    d_feat_t, d_bg = composite_backward_pallas(
        feat_t, tile_start, tile_count, bg, tiles_rgb, tiles_tfin, g_tiles, g_tfin,
        grid_x=cfg.grid_x, grid_y=cfg.grid_y, channels=cfg.channels, tile=cfg.tile,
        chunk=cfg.chunk, interpret=cfg.interpret, align=cfg.align,
        tiles_per_step=cfg.tiles_per_step,
    )
    # Columns past the last tile segment are never written by the kernel
    # (uninitialized memory) — mask them before the gather-transpose scatters
    # them back into Gaussian rows.
    seg_last = tile_start[-1] + ((tile_count[-1] + cfg.chunk - 1) // cfg.chunk) * cfg.chunk
    col = jnp.arange(feat_t.shape[1], dtype=jnp.int32)
    d_feat_t = jnp.where(col[None, :] < seg_last, d_feat_t, 0.0)
    return d_feat_t, None, None, d_bg


composite_tiles_pallas.defvjp(_fwd, _bwd)
