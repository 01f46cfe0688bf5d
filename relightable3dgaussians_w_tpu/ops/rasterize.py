"""Top-level differentiable Gaussian rasterizer: preprocess -> bin -> composite.

TPU-native equivalent of the reference's `GaussianRasterizer` + `_RasterizeGaussians`
autograd op + `CudaRasterizer::Rasterizer::forward/backward`
(submodules/diff-gaussian-rasterization/diff_gaussian_rasterization/__init__.py:40-195,
cuda_rasterizer/rasterizer_impl.cu:198-433), as one pure function. Differences by
design (SURVEY.md §7):

* colors are an arbitrary static channel count, so ALL of the reference's AOV passes
  (color / diffuse / specular / depth / normal / alpha / debug maps — it re-rasterizes
  identical geometry up to ~10x per step, gaussian_renderer/__init__.py:160-264)
  fuse into ONE pass over the sorted entry list; the alpha map is 1 - T_final.
* the `screenspace_points` zero-tensor gradient probe becomes an explicit
  `mean2d_probe` argument: pass zeros of shape [N, 2] and differentiate w.r.t. it to
  obtain the pixel-space mean2D gradients used by densification. Multiply by
  (0.5*W, 0.5*H) to get the reference's NDC-unit contract (backward.cu:460-461).
* static shapes: entry budgets + overflow counters instead of dynamically sized
  buffers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .preprocess import preprocess, PreprocessOut
from .binning import bin_gaussians, bin_gaussians_aligned, align_entries, BinningOut
from .composite import CompositeConfig, composite_tiles, composite_tiles_autodiff


class RasterizerConfig(NamedTuple):
    """Static rasterizer configuration (hashable -> usable as a jit static arg)."""
    width: int
    height: int
    tile: int = 16
    max_dup: int = 1 << 18           # total (Gaussian, tile) entry budget
    max_tiles_per_gauss: int = 64    # per-Gaussian tile cap
    lmax_per_tile: int = 1024        # per-tile compositing depth cap (jnp path)
    tile_chunk: int = 16             # tiles per lax.map step
    scale_modifier: float = 1.0
    use_pallas: bool = False         # stream tiles through the Pallas TPU kernels
    pallas_chunk: int = 256          # entries per streamed chunk (Pallas path)
    tiles_per_step: int = 4          # tiles per composite grid step (Pallas)
    row_intervals: bool = False      # exact per-tile-row ellipse intervals in
                                     # binning (Pallas path): drops (Gaussian,
                                     # tile) pairs outside the alpha>=1/255
                                     # ellipse — image/grad bitwise-free, cuts
                                     # the duplication factor ~8% on isotropic
                                     # and ~30% on anisotropic scenes
    pallas_interpret: bool = False   # interpreter mode (CPU testing)
    align_chunk: int = 128           # tile-segment alignment quantum (TPU DMA
                                     # needs 128; smaller than pallas_chunk cuts
                                     # the pad slots every reorder stage carries)
    skip_alpha: float = 1.0 / 255.0  # rect/interval tightening threshold.
                                     # 1/255 = the compositors' exact skip
                                     # (bitwise reference rendering). Larger =
                                     # SERVING LOD: drops entries whose peak
                                     # in-tile alpha < skip_alpha (each bounded
                                     # by skip_alpha per pixel), cutting the
                                     # sorted/gathered entry count. Training
                                     # must keep the default.
    packed_rgb: bool = False         # SERVING (fwd-only, 3-channel colors):
                                     # quantize R/B to 12-bit fixed point packed
                                     # into ONE feature row (G exact) so the
                                     # entry gather moves 8 rows instead of a
                                     # 16-row padded pack (~half the serving
                                     # path's dominant gather bytes); per-pixel
                                     # |err| <= ~9.8e-4 per packed channel
                                     # (pallas/tile_composite.py pack_rb). No
                                     # VJP — training must keep False. Pallas
                                     # path only: the jnp path ignores the flag
                                     # and renders exact colors.

    @property
    def grid_x(self) -> int:
        return (self.width + self.tile - 1) // self.tile

    @property
    def grid_y(self) -> int:
        return (self.height + self.tile - 1) // self.tile


class CameraMatrices(NamedTuple):
    """Traced camera inputs (math convention: apply as M @ [p, 1])."""
    viewmat: jnp.ndarray   # [4, 4] world -> view
    projmat: jnp.ndarray   # [4, 4] full projection = P @ viewmat
    campos: jnp.ndarray    # [3]
    tan_fovx: jnp.ndarray  # scalar
    tan_fovy: jnp.ndarray  # scalar


class RasterizeAux(NamedTuple):
    radii: jnp.ndarray        # [N] int32 screen radius (0 = culled)
    visibility: jnp.ndarray   # [N] bool (radii > 0) — the reference's visibility_filter
    depth: jnp.ndarray        # [N] view-space z per Gaussian
    alpha: jnp.ndarray        # [H, W] 1 - T_final
    num_entries: jnp.ndarray  # [] int32
    overflow: jnp.ndarray     # [] int32 dropped entries (0 = exact render)


def _gather_features(pre, binning: BinningOut, opacities, colors, mean2d_probe):
    mean2d = pre.mean2d if mean2d_probe is None else pre.mean2d + mean2d_probe
    gid = binning.gauss_id
    feat = jnp.concatenate(
        [
            mean2d[gid],
            pre.conic[gid],
            opacities[gid][:, None] if opacities.ndim == 1 else opacities[gid],
            colors[gid],
        ],
        axis=-1,
    )
    # Padding entries carry the sentinel tile id, so tile ranges never address them;
    # no masking of feat rows is needed here.
    return feat


def _gather_features_t(pre, aligned, opacities, colors, mean2d_probe,
                       interpret: bool = False, packed_rgb: bool = False):
    """Transposed feature gather [F_pad, D_aligned] for the Pallas path: ONE fused
    per-Gaussian feature pack [N, F_pad], one row gather, one transpose. Alignment
    padding entries alias Gaussian 0 but are masked inside the kernel by the per-tile
    count and receive zero gradients. The gather's transpose (the per-Gaussian
    gradient reduction) runs as a Pallas one-hot-matmul segment sum."""
    from .pallas.segment_sum import gather_rows_t

    mean2d = pre.mean2d if mean2d_probe is None else pre.mean2d + mean2d_probe
    if packed_rgb:
        # Serving fast path: RGB -> (12-bit packed R|B, exact G) so the feature
        # pack is exactly 8 rows — no structural padding at all.
        from .pallas.tile_composite import pack_rb

        assert colors.shape[-1] == 3, colors.shape
        rb, g_col = pack_rb(colors)
        feat_pack = jnp.concatenate(
            [mean2d, pre.conic, opacities[:, None], rb[:, None], g_col[:, None]],
            axis=-1)
        return gather_rows_t(feat_pack, aligned.gauss_id, feat_pack.shape[0], 8,
                             interpret)
    f = 6 + colors.shape[-1]
    # f is padded to a sublane multiple (Mosaic rejects non-multiple-of-8 leading
    # dims in the kernels' [F, chunk] DMAs — verified on v5e). The padding is not
    # pure waste: fused AOV channels (diffuse/specular/depth/normal) ride the spare
    # rows for free in the training path.
    f_pad = ((f + 7) // 8) * 8
    parts = [mean2d, pre.conic, opacities[:, None], colors]
    if f_pad != f:
        parts.append(jnp.zeros((colors.shape[0], f_pad - f), colors.dtype))
    feat_pack = jnp.concatenate(parts, axis=-1)      # [N, F_pad]
    return gather_rows_t(feat_pack, aligned.gauss_id, feat_pack.shape[0], f,
                         interpret)


def _assemble_image(tiles_rgb, tiles_tfin, cfg: RasterizerConfig, channels: int):
    gx, gy, t = cfg.grid_x, cfg.grid_y, cfg.tile
    img = tiles_rgb.reshape(gy, gx, t, t, channels)
    img = img.transpose(0, 2, 1, 3, 4).reshape(gy * t, gx * t, channels)
    tfin = tiles_tfin.reshape(gy, gx, t, t).transpose(0, 2, 1, 3).reshape(gy * t, gx * t)
    return img[: cfg.height, : cfg.width], tfin[: cfg.height, : cfg.width]


def rasterize_aux(means3d, scales, quats, cam: CameraMatrices, cfg: RasterizerConfig,
                  cov3d_precomp=None, active=None):
    """Preprocess + binning only (no compositing). Useful for visibility queries —
    the analog of the reference's `markVisible` (rasterize_points.cu:194-213)."""
    pre = preprocess(
        means3d, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, cov3d_precomp, active,
    )
    binning = bin_gaussians(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup, cfg.max_tiles_per_gauss)
    return pre, binning


def _check_bg_vma(bg, feat):
    """Version-independent strict-VMA guard for the compositor's custom VJP.

    Inside a shard_map, `composite_tiles`'s bwd rule computes `d_bg` from the
    entry features and incoming cotangents; under strict varying-manual-axes
    checking (newer jax than this box's 0.9.0) the cotangent's vma must equal
    the primal `bg`'s. A replicated/under-promoted `bg` therefore fails REMOTELY
    while passing locally (MULTICHIP_r03/r04 regressions). This trace-time check
    enforces the invariant `vma(bg) ⊇ vma(feat)` on ANY jax version: callers
    inside shard_map must pvary `bg` over every mesh axis the entry features
    vary over (parallel/gauss_shard.py pvary, parallel/data_parallel.py
    shard_fn). No-op outside shard_map / on jax without vma introspection.
    """
    try:
        bg_vma = frozenset(jax.typeof(bg).vma)
        feat_vma = frozenset(jax.typeof(feat).vma)
    except Exception:
        return
    if not feat_vma <= bg_vma:
        raise ValueError(
            f"composite_tiles: bg varies over manual axes {set(bg_vma)} but the "
            f"entry features vary over {set(feat_vma)}; the custom-VJP d_bg "
            f"cotangent would carry vma {set(feat_vma)} and be rejected by "
            f"strict varying-manual-axes checking. Promote bg with "
            f"jax.lax.pvary over the missing axes "
            f"{set(feat_vma - bg_vma)} before calling rasterize "
            f"(see parallel/gauss_shard.py pvary)."
        )


def rasterize(means3d, scales, quats, opacities, colors, bg,
              cam: CameraMatrices, cfg: RasterizerConfig,
              mean2d_probe=None, cov3d_precomp=None, active=None,
              use_autodiff_twin: bool = False, pre: PreprocessOut | None = None):
    """Render depth-sorted alpha-composited Gaussians.

    Args:
        means3d: [N, 3] world positions.
        scales: [N, 3] activated scales.
        quats: [N, 4] normalized quaternions (w, x, y, z).
        opacities: [N] or [N, 1] activated opacities in (0, 1).
        colors: [N, C] per-Gaussian features to composite (the reference's
            `colors_precomp`; C is static and may fuse many AOV channels).
        bg: [C] background value per channel.
        mean2d_probe: optional [N, 2] zeros; grad w.r.t. it = pixel-space dL/dmean2D.
        cov3d_precomp: optional [N, 6] world covariance override.
        use_autodiff_twin: route compositing through plain jax autodiff instead of the
            analytic custom_vjp backward (parity testing only).
        pre: optional precomputed/modified PreprocessOut (the tile-parallel
            renderer injects band-clamped rects; parallel/tile_parallel.py).

    Returns:
        image: [H, W, C]
        aux: RasterizeAux
    """
    if opacities.ndim == 2:
        opacities = opacities[:, 0]
    if cfg.use_pallas and not use_autodiff_twin:
        from .pallas.wrapper import PallasCompositeConfig, composite_tiles_pallas

        num_tiles = cfg.grid_x * cfg.grid_y
        n = means3d.shape[0]
        if pre is None:
            pre = preprocess(
                means3d, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx,
                cam.tan_fovy, cfg.width, cfg.height, cfg.tile, cfg.scale_modifier,
                cov3d_precomp, active, opacities, skip_alpha=cfg.skip_alpha,
            )
        # The aligned one-sort binning handles any pool below 2^24 (single-u32
        # key when the bits fit, lexicographic 2-key sort otherwise); beyond
        # that the expansion tables lose f32 exactness — fall back to the
        # two-sort path (or shard the pool, parallel/gauss_shard.py).
        use_aligned = n < (1 << 24)
        align = min(cfg.align_chunk, cfg.pallas_chunk)
        if use_aligned:
            intervals = None
            if cfg.row_intervals:
                from .preprocess import row_intervals as _row_intervals

                intervals = _row_intervals(pre, opacities, cfg.tile,
                                            skip_alpha=cfg.skip_alpha)
            # Single sort lands directly in the chunk-aligned layout.
            aligned = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y,
                                            cfg.max_dup, align,
                                            interpret=cfg.pallas_interpret,
                                            slack=cfg.pallas_chunk,
                                            intervals=intervals)
        else:
            from .pallas.segment_sum import MACRO

            binning = bin_gaussians(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup,
                                    cfg.max_tiles_per_gauss)
            d_aligned = cfg.max_dup + num_tiles * align + cfg.pallas_chunk
            d_aligned = ((d_aligned + MACRO - 1) // MACRO) * MACRO
            aligned = align_entries(binning, num_tiles, align, d_aligned)
        feat_t = _gather_features_t(pre, aligned, opacities, colors, mean2d_probe,
                                    interpret=cfg.pallas_interpret,
                                    packed_rgb=cfg.packed_rgb)
        pcfg = PallasCompositeConfig(grid_x=cfg.grid_x, grid_y=cfg.grid_y,
                                     channels=colors.shape[-1], tile=cfg.tile,
                                     chunk=cfg.pallas_chunk, align=align,
                                     tiles_per_step=cfg.tiles_per_step,
                                     interpret=cfg.pallas_interpret,
                                     packed_rgb=cfg.packed_rgb)
        _check_bg_vma(bg, feat_t)
        tiles_rgb, tiles_tfin = composite_tiles_pallas(
            feat_t, aligned.tile_start, aligned.tile_count, bg, pcfg)
        num_entries, overflow = aligned.num_entries, aligned.overflow
    else:
        if pre is None:
            pre = preprocess(
                means3d, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx,
                cam.tan_fovy, cfg.width, cfg.height, cfg.tile, cfg.scale_modifier,
                cov3d_precomp, active, opacities, skip_alpha=cfg.skip_alpha,
            )
        binning = bin_gaussians(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup,
                                cfg.max_tiles_per_gauss)
        feat = _gather_features(pre, binning, opacities, colors, mean2d_probe)
        ccfg = CompositeConfig(
            grid_x=cfg.grid_x, grid_y=cfg.grid_y, tile=cfg.tile, channels=colors.shape[-1],
            lmax_per_tile=cfg.lmax_per_tile, tile_chunk=cfg.tile_chunk,
        )
        composite = composite_tiles_autodiff if use_autodiff_twin else composite_tiles
        _check_bg_vma(bg, feat)
        tiles_rgb, tiles_tfin = composite(feat, binning.tile_start, binning.tile_end, bg, ccfg)
        num_entries, overflow = binning.num_entries, binning.overflow
    image, tfin = _assemble_image(tiles_rgb, tiles_tfin, cfg, colors.shape[-1])
    aux = RasterizeAux(
        radii=pre.radius,
        visibility=pre.radius > 0,
        depth=pre.depth,
        alpha=1.0 - tfin,
        num_entries=num_entries,
        overflow=overflow,
    )
    return image, aux


def make_rasterize_grad_split(cam: CameraMatrices, cfg: RasterizerConfig, loss_fn):
    """Differentiated rasterization as THREE jitted dispatches instead of one
    fused program.

    XLA-on-v5e compiles the rasterizer backward 2-4x slower whenever its inputs
    (mean2d/conic) are parameter EXPRESSIONS instead of program parameters — same
    HLO op mix, worse schedule (scripts/exp_r2a.py staged_pre_probe: 48.7 vs
    61.7 ms on the bin+gather subgraph alone; same pathology the training step's
    split_dispatch sidesteps at the RenderInputs level, BENCH_LOG.md). Staging the
    preprocess outputs across a dispatch boundary removes it:

      P1: preprocess forward (means/scales/quats[/opac] -> PreprocessOut)
      P2: binning + gather + composite + loss, grads w.r.t.
          (mean2d, conic, opacities, colors) — all program parameters
      P3: preprocess VJP (cotangents on mean2d/conic -> d_means/d_scales/d_quats)

    `loss_fn(image, aux) -> scalar` is traced inside P2. Opacity receives no
    preprocess-chain gradient by construction (the rect tightening is behind
    stop_gradient), so P2's d_opac is already total.

    Returns step(means, scales, quats, opac, colors, bg) ->
    (loss, (d_means, d_scales, d_quats, d_opac, d_colors), overflow).
    """

    @jax.jit
    def p1(means3d, scales, quats, opacities):
        return preprocess(
            means3d, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx,
            cam.tan_fovy, cfg.width, cfg.height, cfg.tile, cfg.scale_modifier,
            None, None, opacities,
        )

    @jax.jit
    def p2(pre: PreprocessOut, means3d, opacities, colors, bg):
        def f(mean2d, conic, opac, cols):
            p = pre._replace(mean2d=mean2d, conic=conic)
            img, aux = rasterize(means3d, None, None, opac, cols, bg, cam, cfg,
                                 pre=p)
            return loss_fn(img, aux), aux.overflow

        (loss, overflow), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3), has_aux=True)(
                pre.mean2d, pre.conic, opacities, colors)
        return loss, grads, overflow

    @jax.jit
    def p3(means3d, scales, quats, opacities, d_mean2d, d_conic):
        def f(m, s, q):
            p = preprocess(
                m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
                cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None,
                opacities,
            )
            return p.mean2d, p.conic

        _, vjp = jax.vjp(f, means3d, scales, quats)
        return vjp((d_mean2d, d_conic))

    def step(means3d, scales, quats, opacities, colors, bg):
        pre = p1(means3d, scales, quats, opacities)
        loss, (d_m2d, d_conic, d_opac, d_colors), overflow = p2(
            pre, means3d, opacities, colors, bg)
        d_means, d_scales, d_quats = p3(means3d, scales, quats, opacities,
                                        d_m2d, d_conic)
        return loss, (d_means, d_scales, d_quats, d_opac, d_colors), overflow

    return step
