"""Equirectangular environment-map <-> SH utilities + real-SH rotation, numpy.

TPU-native replacement for the reference's `utils/sh_additional_utils.py` (equirect
SH projection with per-row solid angles :95-206, Lambertian-convolved `sh_render`
:267-299) and its `spaudiopy.sph.rotate_sh` dependency (eval_with_gt_envmaps.py:
306-327). Host-side eval path, outside jit.

Direction convention (self-consistent across the whole framework, including the sky
sphere parameterization in models/gaussians.py): envmap row theta in [0, pi] from the
top, column phi in [0, 2pi);  d = (sin t sin p, -cos t, sin t cos p), so the top row
is world "up" (-y in COLMAP coords). Everything — projection, rendering, rotation,
eval_sh — uses the SAME signed cartesian basis (utils/sh.py), unlike the reference,
which projects with one basis (spherical_harmonics.py), rotates with spaudiopy's and
evaluates with a third (sh_utils eval_sh) and patches frame mismatches with per-scene
initial rotations (test_configs/*/test_config.py).

SH rotation is implemented by exact quadrature projection: for band-limited f,
coeffs' = B^T W B_rot coeffs where B is the basis evaluated on a Gauss-Legendre x
uniform-phi grid and B_rot the basis at inverse-rotated directions. This is exact for
deg <= 5 at the grid sizes used and is convention-free (it uses our own basis).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

from .sh import sh_basis, num_sh_coeffs


def equirect_dirs(width: int) -> np.ndarray:
    """[H, W, 3] directions for an equirect map (H = width // 2)."""
    height = width // 2
    theta = (np.arange(height) + 0.5) / height * np.pi
    phi = (np.arange(width) + 0.5) / width * 2 * np.pi
    t, p = np.meshgrid(theta, phi, indexing="ij")
    st = np.sin(t)
    return np.stack([st * np.sin(p), -np.cos(t), st * np.cos(p)], axis=-1)


def solid_angle_map(width: int) -> np.ndarray:
    """[H, W] per-pixel solid angles (sh_additional_utils.py:95-109)."""
    height = width // 2
    theta = (np.arange(height) + 0.5) / height * np.pi
    dphi = 2 * np.pi / width
    dtheta = np.pi / height
    sa = dphi * (np.cos(theta - dtheta / 2) - np.cos(theta + dtheta / 2))
    # cos decreasing in theta -> positive values.
    return np.repeat(sa[:, None], width, axis=1)


def _basis_map(width: int, deg: int) -> np.ndarray:
    import jax.numpy as jnp

    return np.asarray(sh_basis(deg, jnp.asarray(equirect_dirs(width), jnp.float32)))


def project_envmap_to_sh(img: np.ndarray, deg: int = 4) -> np.ndarray:
    """Project an equirect HDR/LDR image onto the SH basis
    (get_coefficients_from_image, sh_additional_utils.py:176-206).

    Args:
        img: [H, W, 3], H = W // 2 (resized if not).
    Returns:
        [(deg+1)**2, 3]
    """
    import cv2

    if img.shape[1] > 1000:
        img = cv2.resize(img, (1000, 500), interpolation=cv2.INTER_CUBIC)
    if img.shape[0] != img.shape[1] // 2:
        img = cv2.resize(img, (img.shape[1], img.shape[1] // 2), interpolation=cv2.INTER_CUBIC)
    w = img.shape[1]
    B = _basis_map(w, deg)                      # [H, W, K]
    sa = solid_angle_map(w)                     # [H, W]
    return np.einsum("hwk,hwc,hw->kc", B, img[..., :3], sa)


def saturate_envmap(img: np.ndarray, threshold: float, scale: float) -> np.ndarray:
    """Boost saturated pixels before projection (eval_with_gt_envmaps.py:42-48)."""
    img = img.astype(np.float32).copy()
    img[img > threshold] *= scale
    return img


def diffuse_band_coefficients(l_max: int) -> np.ndarray:
    """Lambertian convolution band coefficients / pi
    (get_diffuse_coefficients, sh_additional_utils.py:267-281)."""
    out = [np.pi, (2 * np.pi) / 3]
    for l in range(2, l_max + 1):
        if l % 2 == 0:
            a = (-1.0) ** (l / 2.0 - 1.0)
            b = (l + 2.0) * (l - 1.0)
            c = math.factorial(l) / (2**l * math.factorial(l // 2) ** 2)
            out.append(2 * np.pi * (a / b) * c)
        else:
            out.append(0.0)
    return np.asarray(out) / np.pi


def render_sh_map(coeffs: np.ndarray, width: int = 600, convolve_diffuse: bool = True) -> np.ndarray:
    """Render SH coefficients to an equirect image; by default applies the Lambertian
    band convolution like the reference's sh_render (sh_additional_utils.py:290-299).

    Args:
        coeffs: [K, 3].
    Returns:
        [width // 2, width, 3]
    """
    K = coeffs.shape[0]
    deg = int(math.isqrt(K)) - 1
    B = _basis_map(width, deg)
    c = coeffs.astype(np.float64).copy()
    if convolve_diffuse:
        bands = diffuse_band_coefficients(deg)
        l_per = np.floor(np.sqrt(np.arange(K))).astype(int)
        c = c * bands[l_per][:, None]
    return np.einsum("hwk,kc->hwc", B, c).astype(np.float32)


@lru_cache(maxsize=8)
def _quadrature(deg: int):
    n_theta = 4 * (deg + 1)
    n_phi = 8 * (deg + 1)
    x, wx = np.polynomial.legendre.leggauss(n_theta)
    phi = (np.arange(n_phi) + 0.5) * 2 * np.pi / n_phi
    ct, p = np.meshgrid(x, phi, indexing="ij")
    st = np.sqrt(1 - ct**2)
    d = np.stack([st * np.cos(p), st * np.sin(p), ct], axis=-1).reshape(-1, 3)
    w = (np.broadcast_to(wx[:, None], ct.shape) * (2 * np.pi / n_phi)).reshape(-1)
    return d, w


def euler_zyx_matrix(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """R = Rz(yaw) @ Ry(pitch) @ Rx(roll) — spaudiopy.sph.rotate_sh's convention."""
    cz, sz = np.cos(yaw), np.sin(yaw)
    cy, sy = np.cos(pitch), np.sin(pitch)
    cx, sx = np.cos(roll), np.sin(roll)
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    return Rz @ Ry @ Rx


def sh_rotation_matrix(R: np.ndarray, deg: int) -> np.ndarray:
    """[K, K] matrix M with coeffs_rotated = M @ coeffs, exact for band-limited
    functions: f'(d) = f(R^T d)."""
    import jax.numpy as jnp

    d, w = _quadrature(deg)
    B = np.asarray(sh_basis(deg, jnp.asarray(d, jnp.float32))).astype(np.float64)
    Brot = np.asarray(sh_basis(deg, jnp.asarray(d @ R, jnp.float32))).astype(np.float64)
    # f'(d) = sum_j c_j b_j(R^T d);  c'_i = int b_i(d) f'(d) = sum_d w b_i(d) b_j(R^T d)
    return (B * w[:, None]).T @ Brot


def rotate_sh(coeffs: np.ndarray, yaw: float = 0.0, pitch: float = 0.0, roll: float = 0.0) -> np.ndarray:
    """Rotate real-SH coefficients [K, C] by ZYX Euler angles (replaces
    spaudiopy.sph.rotate_sh in the eval pipeline, eval_with_gt_envmaps.py:306-327)."""
    K = coeffs.shape[0]
    deg = int(math.isqrt(K)) - 1
    M = sh_rotation_matrix(euler_zyx_matrix(yaw, pitch, roll), deg)
    return (M @ coeffs.astype(np.float64)).astype(np.float32)
