"""Tile-parallel rendering: one image's tile rows sharded over a mesh axis.

The second scaling axis from BASELINE.json's north star ("image tiles sharded over
chips") — the reference is strictly single-GPU (SURVEY.md §2.3), so this is additive.
Where data-parallelism shards CAMERAS (parallel/data_parallel.py), tile-parallelism
shards ONE camera's image: after preprocessing, every tile's compositing list is
self-contained, so a horizontal band of tile rows can bin + composite independently
on each device with NO cross-device communication at all (the only replicated work is
the O(N) preprocess, which is ~2% of a 1M-Gaussian frame). Band outputs concatenate
along H into exactly the single-device image — preprocess is bit-identical and each
tile's entry list is unchanged, so this is a bitwise-equal decomposition, not an
approximation.

Use cases: interactive/offline rendering of large frames (4K+) on a pod slice, and
test-time eval sweeps (the 51-angle sun rotation in evaluation.py) where per-device
HBM, not FLOPs, limits resolution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.preprocess import preprocess
from ..ops.rasterize import CameraMatrices, RasterizerConfig, rasterize


def _band_pre(pre, band_gy: int, tile: int, axis: str):
    """Clamp tile rects to this device's band of tile rows and shift pixel-space
    means into band-local coordinates. Gaussians whose rect misses the band get
    tiles_touched = 0 (treated exactly like frustum-culled rows downstream)."""
    idx = jax.lax.axis_index(axis)
    y0 = idx * band_gy
    rmin_y = jnp.clip(pre.rect_min[:, 1] - y0, 0, band_gy)
    rmax_y = jnp.clip(pre.rect_max[:, 1] - y0, 0, band_gy)
    h = jnp.maximum(rmax_y - rmin_y, 0)
    w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
    # Gate on the original tiles_touched: culled rows (tiles_touched == 0) can
    # carry garbage rects that a bare h*w would resurrect inside the band.
    touched = jnp.where(pre.tiles_touched > 0, h * w, 0)
    return pre._replace(
        mean2d=pre.mean2d - jnp.stack(
            [jnp.zeros((), jnp.float32), (y0 * tile).astype(jnp.float32)])[None, :],
        rect_min=pre.rect_min.at[:, 1].set(rmin_y),
        rect_max=pre.rect_max.at[:, 1].set(rmax_y),
        tiles_touched=touched,
        radius=jnp.where(touched > 0, pre.radius, 0),
    )


def rasterize_tile_sharded(means3d, scales, quats, opacities, colors, bg,
                           cam: CameraMatrices, cfg: RasterizerConfig, mesh: Mesh,
                           axis: str = "data", mean2d_probe=None, active=None):
    """`rasterize` with one image's tile rows sharded over `mesh.shape[axis]`
    devices — same (image, RasterizeAux) contract, so it drops into
    `render_from_inputs(..., raster_fn=...)` (renderer.py) for multi-device
    eval/render sweeps.

    The image height must make grid_y divisible by the axis size (pad the camera
    height to a tile*n_devices multiple first). The image is bitwise identical
    to the single-device `rasterize` (band decomposition, module docstring).
    """
    from ..ops.rasterize import RasterizeAux
    from .gauss_shard import pvary

    ndev = mesh.shape[axis]
    gy = cfg.grid_y
    if gy % ndev != 0:
        raise ValueError(f"grid_y={gy} must divide over {ndev} devices; pad height "
                         f"to a multiple of {cfg.tile * ndev}")
    band_gy = gy // ndev
    band_cfg = cfg._replace(height=band_gy * cfg.tile,
                            max_dup=max(cfg.max_dup // ndev, 4096 * 4))
    op1 = opacities[:, 0] if opacities.ndim == 2 else opacities

    def band_render(means3d, scales, quats, opacities, colors, bg, extras):
        # Replicated inputs feeding custom-VJP compute must be promoted to
        # axis-varying so bwd cotangent vma matches (see gauss_shard.pvary).
        bg_v = pvary(bg, axis)
        pre = preprocess(
            means3d, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx,
            cam.tan_fovy, cfg.width, cfg.height, cfg.tile, cfg.scale_modifier,
            None, extras.get("active"), opacities,
        )
        probe = extras.get("probe")
        if probe is not None:
            pre = pre._replace(mean2d=pre.mean2d + probe)
        band = _band_pre(pre, band_gy, cfg.tile, axis)
        img, aux = rasterize(means3d, scales, quats, opacities, colors, bg_v,
                             cam, band_cfg, pre=band)
        overflow = jax.lax.psum(aux.overflow, axis)
        num_entries = jax.lax.psum(aux.num_entries, axis)
        # radius/depth from the UNCLAMPED preprocess are identical on every
        # device (computed from replicated inputs): return them replicated.
        return (img[None], aux.alpha[None], overflow, num_entries,
                pre.radius, pre.depth)

    extras = {}
    if mean2d_probe is not None:
        extras["probe"] = mean2d_probe
    if active is not None:
        extras["active"] = active
    fn = jax.shard_map(
        band_render, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(), {k: P() for k in extras}),
        out_specs=(P(axis), P(axis), P(), P(), P(), P()),
    )
    img_bands, alpha_bands, overflow, num_entries, radii, depth = fn(
        means3d, scales, quats, op1, colors, bg, extras)
    H, W = cfg.height, cfg.width
    C = colors.shape[-1]
    aux = RasterizeAux(
        radii=radii, visibility=radii > 0, depth=depth,
        alpha=alpha_bands.reshape(H, W),
        num_entries=num_entries, overflow=overflow,
    )
    return img_bands.reshape(H, W, C), aux


def make_tile_parallel_raster_fn(mesh: Mesh, axis: str = "data"):
    """raster_fn adapter for render_from_inputs: multi-device eval rendering."""
    def raster_fn(xyz, scales, quats, opacity, colors, bg, cam, rcfg,
                  mean2d_probe=None, active=None):
        return rasterize_tile_sharded(xyz, scales, quats, opacity, colors, bg,
                                      cam, rcfg, mesh, axis=axis,
                                      mean2d_probe=mean2d_probe, active=active)
    return raster_fn


def render_tile_sharded(means3d, scales, quats, opacities, colors, bg,
                        cam: CameraMatrices, cfg: RasterizerConfig, mesh: Mesh,
                        axis: str = "data"):
    """Back-compat wrapper: returns (image [H, W, C], alpha [H, W])."""
    img, aux = rasterize_tile_sharded(means3d, scales, quats, opacities, colors,
                                      bg, cam, cfg, mesh, axis=axis)
    return img, aux.alpha
