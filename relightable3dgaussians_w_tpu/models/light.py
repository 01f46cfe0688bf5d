"""SH environment light with Cook–Torrance split-sum shading, pure jnp.

TPU-native equivalent of the reference's `EnvironmentLight`
(scene/NVDIFFREC/light.py:14-204): per-image SH illumination (degree <= 5), analytic
Ramamoorthi–Hanrahan degree-2 diffuse irradiance, Gauss–Weierstrass roughness
convolution for the specular lobe, and the split-sum FG LUT reflectivity. Stateless and
functional: the SH coefficients (`base`, [(deg+1)**2, 3]) are an argument, set
per-image by the illumination MLP, so everything jits into the fused render pass
instead of running as a separate Python stage.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Toggleable for perf bisection; f32 is the correctness default (see shade()).
SPEC_PRECISION = jax.lax.Precision.HIGHEST

from ..ops.texture import bilinear_sample, bilinear_sample_packed
from ..utils.sh import eval_sh, gauss_kernel, gamma_correction, sh_basis
from .brdf_lut import get_fg_lut, get_fg_lut_quad

# Ramamoorthi–Hanrahan irradiance constants (light.py:36-40).
C1 = 0.429043
C2 = 0.511664
C3 = 0.743125
C4 = 0.886227
C5 = 0.247708


class ShadeOutput(NamedTuple):
    rgb: jnp.ndarray       # [N, 3] gamma-corrected shaded color
    diffuse: jnp.ndarray   # [N, 3] gamma-corrected diffuse component
    specular: jnp.ndarray  # [N, 3] gamma-corrected specular component


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """NVDIFFREC's safe_normalize (util.py:27-31): clamp |x|^2 before sqrt so the
    gradient at 0 stays finite."""
    return x / jnp.sqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2 * jnp.sum(x * n, axis=-1, keepdims=True) * n - x


def diffuse_irradiance(base: jnp.ndarray, normal: jnp.ndarray) -> jnp.ndarray:
    """Degree-2 analytic irradiance (light.py:65-94).

    Args:
        base: [(deg+1)**2 >= 9, 3] SH coefficients.
        normal: [N, 3].
    Returns:
        [N, 3]
    """
    x, y, z = normal[..., 0, None], normal[..., 1, None], normal[..., 2, None]
    return (
        C1 * base[8] * (x**2 - y**2)
        + C3 * base[6] * z**2
        + C4 * base[0]
        - C5 * base[6]
        + 2 * C1 * base[4] * x * y
        + 2 * C1 * base[7] * x * z
        + 2 * C1 * base[5] * y * z
        + 2 * C2 * base[3] * x
        + 2 * C2 * base[1] * y
        + 2 * C2 * base[2] * z
    )


def specular_light_sh(base: jnp.ndarray, kr: jnp.ndarray, sh_degree: int) -> jnp.ndarray:
    """Convolve the env SH with the Gauss–Weierstrass kernel per band
    (light.py:97-119).

    Args:
        base: [(deg+1)**2, 3].
        kr: [N, 1] roughness.
    Returns:
        [N, (deg+1)**2, 3]
    """
    gwk = gauss_kernel(kr, sh_degree)  # [N, (deg+1)**2]
    return gwk[..., None] * base[None]


def sample_illumination(base: jnp.ndarray, sh_degree: int, positions: jnp.ndarray,
                        view_pos: jnp.ndarray) -> jnp.ndarray:
    """Sky radiance along view rays: relu(eval_sh(base, dir)), gamma-corrected
    (light.py:122-128)."""
    d = safe_normalize(positions - view_pos)
    illu = jnp.maximum(eval_sh(sh_degree, jnp.swapaxes(base, 0, 1)[None], d), 0.0)
    return gamma_correction(illu)


def shade(base: jnp.ndarray, sh_degree: int, positions: jnp.ndarray,
          normals: jnp.ndarray, albedo: jnp.ndarray, view_pos: jnp.ndarray,
          kr: jnp.ndarray | None = None, km: jnp.ndarray | None = None,
          specular: bool = True, fg_lut: jnp.ndarray | None = None) -> ShadeOutput:
    """Cook–Torrance IBL shading per Gaussian (light.py:131-193).

    Args:
        base: [(deg+1)**2, 3] environment SH.
        positions: [N, 3] world positions.
        normals: [N, 3] (view-flipped minimum-axis normals).
        albedo: [N, 3] in (0, 1).
        view_pos: [3] camera position.
        kr: [N, 1] roughness; km: [N, 1] metalness.
        specular: Lambertian-only if False.
        fg_lut: optional [256, 256, 2] override of the split-sum LUT.
    """
    irr = jnp.maximum(diffuse_irradiance(base, normals), 1e-4)  # [N, 3]
    diffuse_hdr = albedo * irr
    diffuse_ldr = gamma_correction(diffuse_hdr)

    if not specular:
        zeros = jnp.zeros_like(diffuse_ldr)
        return ShadeOutput(rgb=diffuse_ldr, diffuse=diffuse_ldr, specular=zeros)

    wo = safe_normalize(view_pos[None, :] - positions)
    reflvec = safe_normalize(reflect(wo, normals))
    ndotv = jnp.clip(jnp.sum(wo * normals, axis=-1, keepdims=True), 1e-4, None)
    fg_uv = jnp.concatenate([ndotv, kr], axis=-1)
    if fg_lut is None:
        # Quad-packed LUT: one row gather instead of four per-element gathers
        # (15.5 -> ~4 ms at 500k queries on v5e); values identical to
        # bilinear_sample(get_fg_lut(), uv).
        fg = bilinear_sample_packed(jnp.asarray(get_fg_lut_quad()), fg_uv)
    else:
        fg = bilinear_sample(fg_lut, fg_uv)  # [N, 2]

    # Fused form of eval_sh(specular_light_sh(base, kr), reflvec): the per-Gaussian
    # convolved coefficients [N, K, 3] are never materialized — the per-band
    # Gauss-Weierstrass attenuation folds into the basis row and one [N, K] @ [K, 3]
    # matmul contracts against the shared env SH.
    k = sh_basis(sh_degree, reflvec) * gauss_kernel(kr, sh_degree)  # [N, K]
    spec_irr = jnp.matmul(k, base[: k.shape[-1]],
                          precision=SPEC_PRECISION)                 # [N, 3]
    spec_irr = jnp.maximum(spec_irr, 1e-4)

    if km is None:
        F0 = jnp.full_like(albedo, 0.04)
    else:
        F0 = (1.0 - km) * 0.04 + albedo * km
    reflectivity = F0 * fg[..., 0:1] + fg[..., 1:2]
    specular_hdr = spec_irr * reflectivity

    shaded_hdr = diffuse_hdr + specular_hdr if km is None else (1 - km) * diffuse_hdr + specular_hdr
    return ShadeOutput(
        rgb=gamma_correction(shaded_hdr),
        diffuse=diffuse_ldr,
        specular=gamma_correction(specular_hdr),
    )
