"""Gauss-sharded rendering: pool rows sharded over `gauss`, binning exchanged by
tile ownership via all-to-all — NOT by all-gathering the pool.

This is the distributed analog of the reference's single-device binning
(duplicateWithKeys + radix sort, cuda_rasterizer/rasterizer_impl.cu:303-336) for a
pool that outgrows one chip's HBM (SURVEY.md §5.8). Design:

* Tile OWNERSHIP: the tile grid is split into D horizontal bands of tile rows;
  device d owns band d and composites its pixels.
* Each device preprocesses only its own pool shard (embarrassingly parallel), then
  for every destination band clamps the (opacity-tightened) tile rect to the band
  and packs the contributing rows — per-Gaussian RECORDS (mean2d, conic, opacity,
  colors, depth, global id, band-local rect), NOT per-entry keys, so a Gaussian
  crosses the wire once per band it touches instead of once per tile.
* ONE `jax.lax.all_to_all` over the `gauss` axis ships each bucket to its owner —
  O(N/D * bands_touched) per link instead of the O(N) per chip that all-gathering
  every per-Gaussian feature costs (the r1 fallback XLA inserted).
* Each owner re-expands the received records into (tile, depth-rank) entries and
  runs the standard single-device binning + compositing on its band. Received rows
  are ordered [source shard, ascending local index] = ascending GLOBAL id, and the
  depth sort is stable, so duplication and compositing order — and therefore the
  image — are bitwise-identical to the single-device render.

Static budgets: `rows_per_band` rows per (source, destination) pair; overflowing
rows are dropped and counted (same loud-degradation contract as ops/binning.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.preprocess import preprocess, PreprocessOut
from ..ops.rasterize import CameraMatrices, RasterizerConfig, rasterize


def pvary(x, axis_name):
    """Promote a replicated value to device-varying over `axis_name`.

    Every replicated value that feeds a custom-VJP function inside a shard_map
    MUST be promoted first: the custom bwd rule computes its cotangent from
    varying data, and strict varying-manual-axes checking (jax >= 0.9 lineage)
    requires the cotangent's vma to match the primal input's. pvary's transpose
    is psum over the axis, which is exactly the correct gradient semantics for
    a replicated input (MULTICHIP_r03.json regression)."""
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axis_name, to="varying")
    return jax.lax.pvary(x, axis_name)


def assert_vma(x, axes, what: str):
    """Trace-time guard: `x` must be device-varying over every axis in `axes`.

    `jax.typeof(x).vma` reports the varying manual axes on this box's jax 0.9.0
    even though 0.9.0 does not itself enforce strict vma matching in custom-VJP
    rules — newer jax (the driver's) does. Asserting here makes the local test
    suite fail on exactly the under-promotion that would otherwise only surface
    remotely (MULTICHIP_r03/r04). No-op if vma introspection is unavailable."""
    try:
        vma = frozenset(jax.typeof(x).vma)
    except Exception:
        return
    missing = frozenset(axes) - vma
    if missing:
        raise ValueError(
            f"{what}: expected varying manual axes ⊇ {set(axes)}, got "
            f"{set(vma)} (missing {set(missing)}); promote with pvary before "
            f"it reaches a custom-VJP input")


def _band_records(pre, opacities, colors, gid0, e, band_gy, tile, cap, n_loc):
    """Pack this shard's rows contributing to band `e` into a [cap, R] record
    buffer. Record layout: [mean2d(2) conic(3) op(1) colors(C) depth(1) gid(1)
    rx0(1) ry0(1) w(1) h(1)]; padding rows carry w = h = 0."""
    y0 = e * band_gy
    rmin_y = jnp.clip(pre.rect_min[:, 1] - y0, 0, band_gy)
    rmax_y = jnp.clip(pre.rect_max[:, 1] - y0, 0, band_gy)
    h = jnp.maximum(rmax_y - rmin_y, 0)
    w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 0)
    # Gate on the single-device tiles_touched: culled rows (tiles_touched == 0)
    # can carry garbage rects that would otherwise resurrect here.
    touched = jnp.where(pre.tiles_touched > 0, h * w, 0)
    send_mask = touched > 0

    idx = jnp.nonzero(send_mask, size=cap, fill_value=n_loc)[0]
    valid = idx < n_loc
    safe = jnp.clip(idx, 0, n_loc - 1)
    shift = jnp.asarray([0.0, float(y0 * tile)], jnp.float32)
    rec = jnp.concatenate(
        [
            pre.mean2d[safe] - shift[None, :],
            pre.conic[safe],
            opacities[safe, None],
            colors[safe],
            pre.depth[safe, None],
            (gid0 + idx)[:, None].astype(jnp.float32),   # exact below 2^24
            pre.rect_min[safe, 0, None].astype(jnp.float32),
            rmin_y[safe, None].astype(jnp.float32),
            w[safe, None].astype(jnp.float32),
            h[safe, None].astype(jnp.float32),
        ],
        axis=-1,
    )
    rec = jnp.where(valid[:, None], rec, 0.0)
    dropped = jnp.sum(send_mask) - jnp.sum(valid)  # selections beyond the budget
    return rec, jnp.maximum(dropped, 0)


def _records_to_pre(table, C):
    """Received [M, R] records -> a band-local PreprocessOut (+ op, colors)."""
    mean2d = table[:, 0:2]
    conic = table[:, 2:5]
    op = table[:, 5]
    colors = table[:, 6 : 6 + C]
    depth = table[:, 6 + C]
    gid = table[:, 7 + C]  # noqa: F841  (order is positional; kept for clarity)
    rx0 = table[:, 8 + C].astype(jnp.int32)
    ry0 = table[:, 9 + C].astype(jnp.int32)
    w = table[:, 10 + C].astype(jnp.int32)
    h = table[:, 11 + C].astype(jnp.int32)
    touched = w * h
    pre = PreprocessOut(
        mean2d=mean2d,
        conic=conic,
        depth=depth,
        radius=jnp.where(touched > 0, 1, 0),
        tiles_touched=touched,
        rect_min=jnp.stack([rx0, ry0], axis=-1),
        rect_max=jnp.stack([rx0 + w, ry0 + h], axis=-1),
        cov3d=jnp.zeros((table.shape[0], 6), jnp.float32),
    )
    return pre, op, colors


def default_rows_per_band(n_loc: int, D: int) -> int:
    """Default static per-(source, destination) record budget.

    ~2 * n_loc / D assumes each local row touches ~2 of the D bands on average
    (generous: a band is 1/D of the screen). The receive table is then
    D * cap ~ 2 * n_loc rows — pool-shard-sized, NOT pool-sized, so the path
    keeps its HBM-scaling point at the default (the r2 default of cap = n_loc
    made the receive table full-pool-sized, VERDICT r2 weak #4). Overflow stays
    loud: dropped records are counted and psum'd into the returned counter.
    The floor keeps tiny test scenes exact."""
    return min(n_loc, max(-(-2 * n_loc // D), 4096))


def rasterize_gauss_shard_local(means3d, scales, quats, opacities, colors, bg,
                                cam: CameraMatrices, cfg: RasterizerConfig,
                                D: int, axis: str, rows_per_band: int,
                                mean2d_probe=None, active=None):
    """The per-device gauss-sharded render body — call INSIDE a shard_map whose
    mesh has axis `axis` of size `D`.

    Args are the LOCAL pool shard ([n/D] leading dims) plus the replicated
    bg/cam (promoted to axis-varying here). Both `rasterize_gauss_sharded` (its
    own shard_map) and the fused data x gauss training step
    (parallel/data_parallel.py, where the camera batch is simultaneously sharded
    over `data`) run this body; the all_to_all operates over `axis` only, so
    under a ("data", "gauss") mesh each data row exchanges independently.

    Returns (band_img [H/D, W, C], band_alpha [H/D, W], overflow (psum, axis-
    replicated), num_entries (psum), radius_shard [n/D], depth_shard [n/D]).
    """
    # bg and the camera enter replicated; promote them to axis-varying BEFORE
    # any compute so the custom-VJP bwd rules (composite_tiles' d_bg,
    # ops/composite.py:302-306) return cotangents whose varying manual axes
    # match their primal inputs. The promotion's transpose is a psum over
    # `axis` — the correct reduction for a replicated input's gradient.
    # Closure-capturing them instead leaves them unvarying and trips strict
    # vma checking (MULTICHIP_r03.json).
    bg = pvary(bg, axis)
    cam = jax.tree_util.tree_map(lambda x: pvary(x, axis), cam)
    assert_vma(bg, (axis,), "rasterize_gauss_shard_local bg")
    # The definitive guard — vma(bg) ⊇ vma(entry features) — runs at the
    # composite_tiles call site itself (ops/rasterize._check_bg_vma) and also
    # covers axes OTHER shard_map levels introduce (e.g. `data` in the fused
    # data x gauss step, which must pvary bg over `data` before calling here).

    n_loc = means3d.shape[0]
    gy = cfg.grid_y
    band_gy = gy // D
    C = colors.shape[-1]
    cap = rows_per_band
    band_cfg = cfg._replace(height=band_gy * cfg.tile,
                            max_dup=max(cfg.max_dup // D, 4096))

    d = jax.lax.axis_index(axis)
    op1 = opacities[:, 0] if opacities.ndim == 2 else opacities
    pre = preprocess(
        means3d, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx,
        cam.tan_fovy, cfg.width, cfg.height, cfg.tile, cfg.scale_modifier,
        None, active, op1,
    )
    if mean2d_probe is not None:
        pre = pre._replace(mean2d=pre.mean2d + mean2d_probe)
    gid0 = (d * n_loc).astype(jnp.float32)

    sends, drops = [], []
    for e in range(D):
        rec, dropped = _band_records(pre, op1, colors, gid0, e, band_gy,
                                     cfg.tile, cap, n_loc)
        sends.append(rec)
        drops.append(dropped)
    send = jnp.stack(sends)                                     # [D, cap, R]

    # The one collective: record buckets to their tile-band owners.
    recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                              tiled=True)                       # [D, cap, R]
    table = recv.reshape(D * cap, send.shape[-1])

    pre_b, op_b, col_b = _records_to_pre(table, C)
    zeros3 = jnp.zeros((D * cap, 3), jnp.float32)
    quats0 = jnp.zeros((D * cap, 4), jnp.float32).at[:, 0].set(1.0)
    img, aux = rasterize(zeros3, jnp.ones_like(zeros3), quats0, op_b, col_b,
                         bg, cam, band_cfg, pre=pre_b)
    # psum makes these replicated (vma drops `axis`) -> out_specs P().
    overflow = jax.lax.psum(sum(drops) + aux.overflow, axis)
    num_entries = jax.lax.psum(aux.num_entries, axis)
    return img, aux.alpha, overflow, num_entries, pre.radius, pre.depth


def rasterize_gauss_sharded(means3d, scales, quats, opacities, colors, bg,
                            cam: CameraMatrices, cfg: RasterizerConfig,
                            mesh: Mesh, axis: str = "gauss",
                            rows_per_band: int | None = None,
                            mean2d_probe=None, active=None):
    """`rasterize` with the POOL sharded over `axis`; tile-band owners composite.

    Differentiable w.r.t. (means3d, scales, quats, opacities, colors,
    mean2d_probe): gradients of the shaded record fields route back through the
    all_to_all transpose to the source shard, then through the local preprocess
    VJP — no full-pool all-gather in forward OR backward
    (tests/test_gauss_shard.py asserts the lowered HLO).

    Args:
        means3d..colors: pool arrays, leading dim sharded over `axis` (place them
            with NamedSharding(mesh, P(axis)) or pass host arrays — shard_map
            splits them). colors may carry any static channel count (fused AOVs).
        rows_per_band: static per-(source, destination) record budget
            (default: `default_rows_per_band`).
        mean2d_probe: optional [N, 2] zeros (sharded over `axis`); grad w.r.t. it
            is the pixel-space dL/dmean2D densification probe.
        active: optional [N] bool alive mask (sharded over `axis`).

    Returns:
        (image [H, W, C], aux: RasterizeAux) — image/alpha bitwise equal to the
        single-device `rasterize`; radii/visibility/depth are the full [N]
        per-Gaussian arrays (shard-concatenated); overflow counts records dropped
        by the budget plus per-band binning overflow (0 = exact).
    """
    from ..ops.rasterize import RasterizeAux

    D = mesh.shape[axis]
    gy = cfg.grid_y
    if gy % D != 0:
        raise ValueError(f"grid_y={gy} must divide over {D} devices; pad height "
                         f"to a multiple of {cfg.tile * D}")
    n = means3d.shape[0]
    if n % D != 0:
        raise ValueError(f"pool size {n} must divide over {D} devices")
    if n >= (1 << 24):
        # Global ids ride the record table as f32 (exact below 2^24 only) —
        # refuse loudly instead of silently corrupting ids at Trevi-scale pools.
        raise ValueError(
            f"pool size {n} >= 2^24: global ids are packed as f32 in the "
            f"record exchange; split the id into two fields before going bigger")
    n_loc = n // D
    cap = rows_per_band or default_rows_per_band(n_loc, D)
    band_gy = gy // D
    C = colors.shape[-1]
    band_cfg = cfg._replace(height=band_gy * cfg.tile,
                            max_dup=max(cfg.max_dup // D, 4096))

    has_probe = mean2d_probe is not None
    has_active = active is not None

    def shard_fn(means3d, scales, quats, opacities, colors, bg, cam, extras):
        img, alpha, overflow, num_entries, radius, depth = (
            rasterize_gauss_shard_local(
                means3d, scales, quats, opacities, colors, bg, cam, cfg, D,
                axis, cap, mean2d_probe=extras.get("probe"),
                active=extras.get("active")))
        return img[None], alpha[None], overflow, num_entries, radius, depth

    specs = P(axis)
    extras = {}
    if has_probe:
        extras["probe"] = mean2d_probe
    if has_active:
        extras["active"] = active
    extras_specs = {k: specs for k in extras}
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(specs, specs, specs, specs, specs, P(), P(), extras_specs),
        out_specs=(P(axis), P(axis), P(), P(), P(axis), P(axis)),
    )
    img_bands, alpha_bands, overflow, num_entries, radii, depth = fn(
        means3d, scales, quats, opacities, colors, bg, cam, extras)
    H, W = cfg.height, cfg.width
    image = img_bands.reshape(H, W, C)
    aux = RasterizeAux(
        radii=radii,
        visibility=radii > 0,
        depth=depth,
        alpha=alpha_bands.reshape(H, W),
        num_entries=num_entries,   # global: sum of per-band binning entries
        overflow=overflow,
    )
    return image, aux


def render_gauss_sharded(means3d, scales, quats, opacities, colors, bg,
                        cam: CameraMatrices, cfg: RasterizerConfig, mesh: Mesh,
                        axis: str = "gauss", rows_per_band: int | None = None):
    """Forward-only convenience wrapper: returns (image, alpha, overflow)."""
    img, aux = rasterize_gauss_sharded(
        means3d, scales, quats, opacities, colors, bg, cam, cfg, mesh,
        axis=axis, rows_per_band=rows_per_band)
    return img, aux.alpha, aux.overflow
