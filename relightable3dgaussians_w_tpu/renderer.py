"""Fused relightable render pass.

TPU-native equivalent of the reference's `render()`
(gaussian_renderer/__init__.py:69-274). The reference invokes the CUDA rasterizer up
to ~10x per step over identical geometry — once for color and once per AOV (diffuse,
specular, depth, normal, alpha, debug maps). Here all AOVs are channels of ONE
multi-channel compositing pass over the same sorted entry list (SURVEY.md §7), and the
alpha map falls out of the transmittance for free. Per-Gaussian Cook–Torrance SH
shading (scene/NVDIFFREC/light.py) is computed inline so the whole forward jits into a
single XLA program.

Channel layout (with debug=True):
    0:3  rgb           3:6  diffuse      6:9  specular     9    depth
    10:13 normal*0.5+0.5  13:16 sky_color  16 roughness    17   metalness
    18:21 albedo
debug=False drops channels 13:21.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .ops.rasterize import rasterize, RasterizerConfig, CameraMatrices
from .models import gaussians as G
from .models import light as L
from .utils.sh import eval_sh
from .utils.graphics import depth_to_normal


class RenderOutput(NamedTuple):
    render: jnp.ndarray          # [H, W, 3]
    diffuse_color: jnp.ndarray   # [H, W, 3]
    specular_color: jnp.ndarray  # [H, W, 3]
    depth: jnp.ndarray           # [H, W]
    normal: jnp.ndarray          # [H, W, 3] in (-1, 1), sky-masked
    alpha: jnp.ndarray           # [H, W]
    normal_ref: jnp.ndarray      # [H, W, 3] depth-derived pseudo ground truth
    radii: jnp.ndarray           # [N]
    visibility_filter: jnp.ndarray  # [N] bool
    gauss_depth: jnp.ndarray     # [N] view z (for the sky depth loss)
    overflow: jnp.ndarray        # [] int32
    sky_color: jnp.ndarray | None = None
    roughness: jnp.ndarray | None = None
    metalness: jnp.ndarray | None = None
    albedo: jnp.ndarray | None = None


def compute_colors(params: G.GaussianParams, state: G.GaussianState,
                   envlight_base: jnp.ndarray, sky_sh: jnp.ndarray,
                   envlight_sh_degree: int, sky_sh_degree: int,
                   campos: jnp.ndarray, specular: bool = True, fix_sky: bool = False,
                   debug: bool = True, rgb_only: bool = False):
    """Per-Gaussian feature channels for the fused pass.

    Mirrors gaussian_renderer/__init__.py:119-157: Cook–Torrance shading for
    foreground rows, sky SH color (+0.5, clamped at 0) or fixed white for sky rows.
    Returns (colors [N, C], normals [N, 3]).
    """
    xyz = G.get_xyz(params, state)
    albedo = G.get_albedo(params)
    kr = G.get_roughness(params)
    km = G.get_metalness(params)
    is_sky = state.is_sky[:, None]

    dir_pp = xyz - campos[None, :]
    dir_pp_n = L.safe_normalize(dir_pp)
    normal = G.get_normal(params, dir_pp_n)

    shaded = L.shade(envlight_base, envlight_sh_degree, xyz, normal, albedo, campos,
                     kr, km, specular=specular)

    if fix_sky:
        sky_rgb = jnp.ones_like(xyz)
    else:
        sky_sh2rgb = eval_sh(sky_sh_degree, jnp.swapaxes(sky_sh, -1, -2), dir_pp_n)
        sky_rgb = jnp.maximum(sky_sh2rgb + 0.5, 0.0)

    rgb = jnp.where(is_sky, sky_rgb, shaded.rgb)
    if rgb_only:
        return rgb, normal
    diffuse = jnp.where(is_sky, 0.0, shaded.diffuse)
    spec = jnp.where(is_sky, 0.0, shaded.specular)
    depth_feat = jnp.zeros((xyz.shape[0], 1))  # filled by caller with view-space z
    normal_feat = 0.5 * normal + 0.5

    channels = [rgb, diffuse, spec, depth_feat, normal_feat]
    if debug:
        sky_color = jnp.where(is_sky, sky_rgb, 0.0)
        channels += [
            sky_color,
            jnp.where(is_sky, 0.0, kr),
            jnp.where(is_sky, 0.0, km),
            jnp.where(is_sky, jnp.ones_like(albedo), albedo),
        ]
    return jnp.concatenate(channels, axis=-1), normal


def render(params: G.GaussianParams, state: G.GaussianState,
           envlight_base: jnp.ndarray, sky_sh: jnp.ndarray,
           cam: CameraMatrices, rcfg: RasterizerConfig,
           bg_color: jnp.ndarray, sky_mask: jnp.ndarray,
           envlight_sh_degree: int = 4, sky_sh_degree: int = 1,
           specular: bool = True, fix_sky: bool = False, debug: bool = True,
           normal_view: bool = False, mean2d_probe=None,
           c2w: jnp.ndarray | None = None,
           use_autodiff_twin: bool = False, raster_fn=None) -> RenderOutput:
    """Full relightable forward pass for one camera.

    Args:
        envlight_base: [(envlight_deg+1)**2, 3] per-image environment SH (MLP output).
        sky_sh: [1, (sky_deg+1)**2, 3] sky SH (MLP output).
        bg_color: [3].
        sky_mask: [H, W] 1 = not sky (masks the normal maps as in the reference).
        c2w: [4, 4] camera-to-world, needed for normal_ref (defaults to inv(viewmat)
            computed here if None).
        mean2d_probe: optional [N, 2] zeros for densification gradients.
    """
    inp = render_inputs(params, state, envlight_base, sky_sh, cam,
                        envlight_sh_degree, sky_sh_degree, specular, fix_sky, debug)
    return render_from_inputs(inp, state, cam, rcfg, bg_color, sky_mask,
                              debug=debug, normal_view=normal_view,
                              mean2d_probe=mean2d_probe, c2w=c2w,
                              use_autodiff_twin=use_autodiff_twin,
                              raster_fn=raster_fn)


class RenderInputs(NamedTuple):
    """The rasterizer's leaf inputs, as produced from parameters by render_inputs.

    Splitting render() at this seam lets the training step run as separate
    dispatches (param->leaf stage, leaf->loss-grad stage, leaf-VJP stage): XLA
    compiles the rasterizer backward ~2x faster when its inputs are program
    parameters than when they are expressions of the Gaussian params (measured
    87 vs 155-355 ms at 500k/800^2 on v5e; scripts/profile_seams.py — the HLOs
    are near-identical, the compiled schedule is not)."""
    xyz: jnp.ndarray       # [N, 3]
    scales: jnp.ndarray    # [N, 3]
    quats: jnp.ndarray     # [N, 4]
    opacity: jnp.ndarray   # [N, 1]
    colors: jnp.ndarray    # [N, C] fused AOV channels (depth channel filled)


def render_rgb(params: G.GaussianParams, state: G.GaussianState,
               envlight_base: jnp.ndarray, sky_sh: jnp.ndarray,
               cam: CameraMatrices, rcfg: RasterizerConfig,
               bg_color: jnp.ndarray, envlight_sh_degree: int = 4,
               sky_sh_degree: int = 1, specular: bool = True,
               fix_sky: bool = False):
    """SERVING fast path: composite ONLY the 3 RGB channels (+ free alpha).

    The full render() fuses 13-21 AOV channels for training; a viewer frame
    needs just the shaded color, so this skips the AOV feature build, binning/
    gathering rides 3 channels, and the compositor's channel contraction is
    minimal. Combine with RasterizerConfig.skip_alpha for the serving LOD
    trade (runtime.serve_skip_alpha). Returns (rgb [H, W, 3], alpha [H, W]).
    Reference leg: real-time SIBR viewing, gaussian_renderer/network_gui.py.
    """
    xyz = G.get_xyz(params, state)
    scales = G.get_scaling(params)
    quats = G.get_rotation(params)
    opacity = G.get_opacity(params, state)
    rgb_g, _ = compute_colors(params, state, envlight_base, sky_sh,
                              envlight_sh_degree, sky_sh_degree, cam.campos,
                              specular, fix_sky, rgb_only=True)
    image, aux = rasterize(xyz, scales, quats, opacity, rgb_g, bg_color, cam,
                           rcfg, active=state.alive)
    return image, aux.alpha


def render_inputs(params: G.GaussianParams, state: G.GaussianState,
                  envlight_base: jnp.ndarray, sky_sh: jnp.ndarray,
                  cam: CameraMatrices, envlight_sh_degree: int = 4,
                  sky_sh_degree: int = 1, specular: bool = True,
                  fix_sky: bool = False, debug: bool = True) -> RenderInputs:
    """Parameters + lighting -> activated rasterizer leaf inputs."""
    xyz = G.get_xyz(params, state)
    scales = G.get_scaling(params)
    quats = G.get_rotation(params)
    opacity = G.get_opacity(params, state)

    colors, _ = compute_colors(params, state, envlight_base, sky_sh,
                               envlight_sh_degree, sky_sh_degree, cam.campos,
                               specular, fix_sky, debug)

    # View-space depth channel (gaussian_model.py:125-130): composited with the main
    # background like every reference AOV pass.
    depth_g = xyz @ cam.viewmat[2, :3] + cam.viewmat[2, 3]
    colors = colors.at[:, 9].set(depth_g)
    return RenderInputs(xyz, scales, quats, opacity, colors)


def render_from_inputs(inp: RenderInputs, state: G.GaussianState,
                       cam: CameraMatrices, rcfg: RasterizerConfig,
                       bg_color: jnp.ndarray, sky_mask: jnp.ndarray,
                       debug: bool = True, normal_view: bool = False,
                       mean2d_probe=None, c2w: jnp.ndarray | None = None,
                       use_autodiff_twin: bool = False,
                       raster_fn=None, pre=None) -> RenderOutput:
    """Rasterize the prepared leaf inputs and assemble the AOV maps.

    raster_fn: optional override with `rasterize`'s
    (xyz, scales, quats, opacity, colors, bg, cam, rcfg, mean2d_probe, active)
    -> (image, aux) contract — the gauss-sharded training step injects
    parallel.gauss_shard.rasterize_gauss_sharded here.
    pre: optional precomputed PreprocessOut (the split training step stages it
    as program parameters across a dispatch boundary, train_step.py)."""
    C = inp.colors.shape[-1]
    bg = jnp.concatenate([
        bg_color, bg_color, bg_color, bg_color[:1],  # rgb, diffuse, specular, depth
        bg_color,                                    # normal
    ])
    if debug:
        bg = jnp.concatenate([bg, bg_color, bg_color[:1], bg_color[:1], bg_color])
    assert bg.shape[0] == C, (bg.shape, C)

    if raster_fn is not None:
        image, aux = raster_fn(inp.xyz, inp.scales, inp.quats, inp.opacity,
                               inp.colors, bg, cam, rcfg,
                               mean2d_probe=mean2d_probe, active=state.alive)
    else:
        image, aux = rasterize(
            inp.xyz, inp.scales, inp.quats, inp.opacity, inp.colors, bg, cam, rcfg,
            mean2d_probe=mean2d_probe, active=state.alive,
            use_autodiff_twin=use_autodiff_twin, pre=pre,
        )

    alpha = aux.alpha
    depth_map = image[..., 9]
    normal_map = (image[..., 10:13] - 0.5) * 2.0
    if normal_view:
        normal_map = -normal_map
    sm = sky_mask[..., None]
    normal_map = normal_map * sm + (1.0 - sm)

    # Depth-derived reference normal (gaussian_renderer/__init__.py:267-271).
    if c2w is None:
        c2w = jnp.linalg.inv(cam.viewmat)
    normal_ref = depth_to_normal(depth_map * sky_mask, c2w, cam.tan_fovx, cam.tan_fovy)
    normal_ref = normal_ref * jax.lax.stop_gradient(alpha)[..., None]
    normal_ref = normal_ref + (1.0 - sm)

    return RenderOutput(
        render=image[..., 0:3],
        diffuse_color=image[..., 3:6],
        specular_color=image[..., 6:9],
        depth=depth_map,
        normal=normal_map,
        alpha=alpha,
        normal_ref=normal_ref,
        radii=aux.radii,
        visibility_filter=aux.visibility,
        gauss_depth=aux.depth,
        overflow=aux.overflow,
        sky_color=image[..., 13:16] if debug else None,
        roughness=image[..., 16] if debug else None,
        metalness=image[..., 17] if debug else None,
        albedo=image[..., 18:21] if debug else None,
    )
