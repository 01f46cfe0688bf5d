"""Legacy cubemap split-sum environment light, pure jnp.

TPU-native equivalent of the reference's original NVDIFFREC path
(scene/NVDIFFREC/light_original.py: `cubemap_mip`, `build_mips`, `shade`, hdr load)
and its CUDA helpers (`diffuse_cubemap`, `specular_cubemap`,
renderutils/c_src/cubemap.cu). The main relightable pipeline uses the SH light
(models/light.py); this module covers the reference's legacy path: a trainable 6-face
cubemap whose mip chain is GGX-prefiltered for the split-sum approximation.

Differences by design: the CUDA `specular_cubemap` accumulates over a solid-angle
bound per texel; here each mip level is prefiltered by GGX-importance Monte Carlo
(vectorized over all texels at once — mip resolutions are small), and cube sampling
is per-face bilinear (no seam blending).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.texture import bilinear_sample
from .brdf_lut import get_fg_lut
from .light import safe_normalize, reflect

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


def cube_to_dir(face: int, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Face uv in [-1,1] -> direction (OpenGL cubemap convention, util.cube_to_dir)."""
    one = jnp.ones_like(x)
    if face == 0:
        v = (one, -y, -x)
    elif face == 1:
        v = (-one, -y, x)
    elif face == 2:
        v = (x, one, y)
    elif face == 3:
        v = (x, -one, -y)
    elif face == 4:
        v = (x, -y, one)
    else:
        v = (-x, -y, -one)
    return jnp.stack(v, axis=-1)


def dir_to_cube(d: jnp.ndarray):
    """Direction -> (face index, u, v in [0,1])."""
    ax, ay, az = jnp.abs(d[..., 0]), jnp.abs(d[..., 1]), jnp.abs(d[..., 2])
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    # Face selection by dominant axis.
    fx = jnp.where(x > 0, 0, 1)
    fy = jnp.where(y > 0, 2, 3)
    fz = jnp.where(z > 0, 4, 5)
    face = jnp.where((ax >= ay) & (ax >= az), fx, jnp.where(ay >= az, fy, fz))
    ma = jnp.maximum(jnp.maximum(ax, ay), az) + 1e-12
    # Per-face (u, v) consistent with cube_to_dir above.
    u = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-z / ma, z / ma, x / ma, x / ma, x / ma, -x / ma],
    )
    v = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-y / ma, -y / ma, z / ma, -z / ma, -y / ma, -y / ma],
    )
    return face, (u + 1) * 0.5, (v + 1) * 0.5


def sample_cubemap(cubemap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """cubemap: [6, R, R, C]; dirs: [..., 3] -> [..., C] (per-face bilinear)."""
    face, u, v = dir_to_cube(safe_normalize(dirs))
    uv = jnp.stack([u, v], axis=-1)
    samples = jnp.stack([bilinear_sample(cubemap[f], uv) for f in range(6)], axis=0)
    return jnp.take_along_axis(
        samples, face[None, ..., None].astype(jnp.int32), axis=0
    )[0]


def cubemap_mip(cubemap: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool one mip level (light_original.py:22-38 forward)."""
    six, r, _, c = cubemap.shape
    x = cubemap.reshape(six, r // 2, 2, r // 2, 2, c)
    return x.mean(axis=(2, 4))


def _face_dirs(res: int) -> jnp.ndarray:
    g = (jnp.arange(res) + 0.5) / res * 2.0 - 1.0
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    return jnp.stack([safe_normalize(cube_to_dir(f, gx, gy)) for f in range(6)], axis=0)


def diffuse_cubemap(cubemap: jnp.ndarray, n_samples: int = 4096, seed: int = 0) -> jnp.ndarray:
    """Cosine-convolved irradiance cubemap (ru.diffuse_cubemap equivalent):
    E(n) = mean over cosine-weighted dirs of L(w)."""
    six, res, _, c = cubemap.shape
    dirs = _face_dirs(res)  # [6, R, R, 3]
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (n_samples, 2))
    # Cosine-weighted hemisphere samples in tangent space.
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                       jnp.sqrt(jnp.maximum(1 - u[:, 0], 0.0))], axis=-1)

    n = dirs.reshape(-1, 3)
    up = jnp.where(jnp.abs(n[:, 2:3]) < 0.999, jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t = safe_normalize(jnp.cross(up, n))
    b = jnp.cross(n, t)

    def body(i, acc):
        w = local[i, 0] * t + local[i, 1] * b + local[i, 2] * n
        return acc + sample_cubemap(cubemap, w)

    acc = jax.lax.fori_loop(0, n_samples, body, jnp.zeros((n.shape[0], c)))
    return (acc / n_samples).reshape(six, res, res, c)


def specular_cubemap(cubemap: jnp.ndarray, roughness: float, n_samples: int = 1024,
                     seed: int = 0) -> jnp.ndarray:
    """GGX-prefiltered cubemap at one roughness (ru.specular_cubemap equivalent,
    Karis split-sum prefilter with N = V = R)."""
    six, res, _, c = cubemap.shape
    if roughness <= MIN_ROUGHNESS * 0.5:
        return cubemap
    a = roughness * roughness
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (n_samples, 2))
    phi = 2 * jnp.pi * u[:, 0]
    ct = jnp.sqrt((1 - u[:, 1]) / (1 + (a * a - 1) * u[:, 1]))
    st = jnp.sqrt(jnp.maximum(1 - ct**2, 0.0))
    local_h = jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, ct], axis=-1)

    n = _face_dirs(res).reshape(-1, 3)
    up = jnp.where(jnp.abs(n[:, 2:3]) < 0.999, jnp.array([0.0, 0.0, 1.0]), jnp.array([1.0, 0.0, 0.0]))
    t = safe_normalize(jnp.cross(up, n))
    b = jnp.cross(n, t)

    def body(i, carry):
        acc, wsum = carry
        h = local_h[i, 0] * t + local_h[i, 1] * b + local_h[i, 2] * n
        l = reflect(n, h)
        ndotl = jnp.sum(n * l, axis=-1, keepdims=True)
        w = jnp.maximum(ndotl, 0.0)
        return acc + sample_cubemap(cubemap, l) * w, wsum + w

    acc, wsum = jax.lax.fori_loop(
        0, n_samples, body,
        (jnp.zeros((n.shape[0], c)), jnp.zeros((n.shape[0], 1))),
    )
    return (acc / jnp.maximum(wsum, 1e-6)).reshape(six, res, res, c)


class CubemapLightMips(NamedTuple):
    specular: tuple          # tuple of [6, R_i, R_i, 3] prefiltered mips
    diffuse: jnp.ndarray     # [6, R_min, R_min, 3]


def build_mips(base: jnp.ndarray, cutoff: float = 0.99) -> CubemapLightMips:
    """Mip chain + GGX prefilter + diffuse convolution
    (light_original.py:70-81)."""
    chain = [base]
    while chain[-1].shape[1] > LIGHT_MIN_RES:
        chain.append(cubemap_mip(chain[-1]))
    diffuse = diffuse_cubemap(chain[-1])
    spec = []
    n_lvl = len(chain)
    for idx, level in enumerate(chain):
        if idx < n_lvl - 1:
            rough = (idx / max(n_lvl - 2, 1)) * (MAX_ROUGHNESS - MIN_ROUGHNESS) + MIN_ROUGHNESS
        else:
            rough = 1.0
        spec.append(specular_cubemap(level, rough, seed=idx))
    return CubemapLightMips(specular=tuple(spec), diffuse=diffuse)


def get_mip(roughness: jnp.ndarray, n_levels: int) -> jnp.ndarray:
    """Roughness -> fractional mip level (light_original.py:65-68)."""
    lo = (jnp.clip(roughness, MIN_ROUGHNESS, MAX_ROUGHNESS) - MIN_ROUGHNESS) / (
        MAX_ROUGHNESS - MIN_ROUGHNESS) * (n_levels - 2)
    hi = (jnp.clip(roughness, MAX_ROUGHNESS, 1.0) - MAX_ROUGHNESS) / (
        1.0 - MAX_ROUGHNESS) + n_levels - 2
    return jnp.where(roughness < MAX_ROUGHNESS, lo, hi)


def shade_cubemap(mips: CubemapLightMips, positions, normals, kd, ks, view_pos,
                  specular: bool = True, fg_lut=None):
    """Split-sum shading against the prefiltered cubemap
    (light_original.py:129-186). ks = (spec_strength_unused, roughness, metallic)."""
    wo = safe_normalize(view_pos[None, :] - positions)
    if specular:
        roughness = ks[..., 1:2]
        metallic = ks[..., 2:3]
        spec_col = (1.0 - metallic) * 0.04 + kd * metallic
        diff_col = kd * (1.0 - metallic)
    else:
        diff_col = kd

    irradiance = sample_cubemap(mips.diffuse, normals)
    shaded = diff_col * irradiance
    if not specular:
        return shaded

    reflvec = safe_normalize(reflect(wo, normals))
    lut = jnp.asarray(get_fg_lut()) if fg_lut is None else fg_lut
    ndotv = jnp.clip(jnp.sum(wo * normals, axis=-1, keepdims=True), 1e-4, None)
    fg = bilinear_sample(lut, jnp.concatenate([ndotv, roughness], axis=-1))

    n_lvl = len(mips.specular)
    miplevel = get_mip(roughness, n_lvl)
    lo = jnp.clip(jnp.floor(miplevel).astype(jnp.int32), 0, n_lvl - 1)
    frac = miplevel - lo.astype(miplevel.dtype)
    samples = jnp.stack([sample_cubemap(m, reflvec) for m in mips.specular], axis=0)
    s_lo = jnp.take_along_axis(samples, lo[None, ...].repeat(3, -1).astype(jnp.int32), axis=0)[0]
    hi = jnp.clip(lo + 1, 0, n_lvl - 1)
    s_hi = jnp.take_along_axis(samples, hi[None, ...].repeat(3, -1).astype(jnp.int32), axis=0)[0]
    spec = s_lo * (1 - frac) + s_hi * frac

    reflectance = spec_col * fg[..., 0:1] + fg[..., 1:2]
    return shaded + spec * reflectance


def load_hdr_cubemap(path: str, res: int = 512) -> jnp.ndarray:
    """Load a lat-long HDR/LDR image into a cubemap (light_original.py:193-206)."""
    import cv2

    if path.lower().endswith((".hdr", ".exr")):
        img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)[..., ::-1]
    else:
        img = cv2.imread(path)[..., ::-1] / 255.0
    img = jnp.asarray(np.ascontiguousarray(img), jnp.float32)
    dirs = _face_dirs(res)  # [6, R, R, 3]
    # latlong lookup with the same convention as utils/envmap.py.
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    theta = jnp.arccos(jnp.clip(-y, -1, 1))
    phi = jnp.remainder(jnp.arctan2(x, z), 2 * jnp.pi)
    uv = jnp.stack([phi / (2 * jnp.pi), theta / jnp.pi], axis=-1)
    return bilinear_sample(img, uv)
