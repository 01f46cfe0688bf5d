"""Camera / projection / rotation / covariance math, pure jnp (+numpy for host-side).

TPU-native equivalent of the reference's `utils/graphics_utils.py` and the quaternion /
covariance helpers in `utils/general_utils.py:98-131` and
`cuda_rasterizer/forward.cu:118-152`. Convention note: the reference stores camera
matrices *transposed* (torch `p @ M` style); this framework uses plain math convention
everywhere — `p_view = viewmat @ [p, 1]` — which is what the reference's CUDA kernels
effectively compute (`auxiliary.h:58-77` reads the transposed tensor column-major).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp


class BasicPointCloud(NamedTuple):
    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray


# ----------------------------------------------------------------------------- cameras


def world_to_view(R: np.ndarray, t: np.ndarray, translate=None, scale: float = 1.0) -> np.ndarray:
    """World->view 4x4 (math convention). Mirrors `getWorld2View2`
    (reference utils/graphics_utils.py:47-58): R is COLMAP's cam-from-world rotation
    transposed (i.e. world-from-cam rotation), t the cam-from-world translation; an
    optional recentering translate/scale is applied to the camera center.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        C2W = np.linalg.inv(Rt)
        C2W[:3, 3] = (C2W[:3, 3] + translate) * scale
        Rt = np.linalg.inv(C2W)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style perspective with z in [0, zfar/(zfar-znear)] range and +z forward.

    Same matrix as the reference `getProjectionMatrix`
    (utils/graphics_utils.py:60-80), math convention (apply as P @ p).
    """
    tan_hx = math.tan(fovx / 2)
    tan_hy = math.tan(fovy / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_hx
    P[1, 1] = 1.0 / tan_hy
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def ndc_to_pixel(v: jnp.ndarray, size) -> jnp.ndarray:
    """NDC [-1,1] -> continuous pixel center coordinate (auxiliary.h:41-44)."""
    return ((v + 1.0) * size - 1.0) * 0.5


# ------------------------------------------------------------------- rotations / covs


def safe_normalize(x: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """x / |x| with a clamped squared norm so the gradient at x=0 is 0, not NaN
    (the d|x|/dx = x/|x| singularity; same guard as NVDIFFREC util.py:27-31)."""
    return x * jax.lax.rsqrt(jnp.maximum(jnp.sum(x * x, axis=-1, keepdims=True), eps))


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> 3x3 rotation matrix, batched over leading dims.

    Standard 3DGS convention (reference utils/general_utils.py:98-119 after
    normalization). Input need not be normalized; we normalize here.
    """
    q = safe_normalize(q)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def quat_to_rotmat_raw(q: jnp.ndarray) -> jnp.ndarray:
    """Like quat_to_rotmat but WITHOUT normalization — matches the rasterizer's
    `computeCov3D` (forward.cu:118-152), which assumes inputs were pre-normalized by
    the model's rotation activation and deliberately skips renormalization (so does
    its backward, backward.cu:338-340)."""
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): columns are the scaled principal axes
    (reference utils/general_utils.py:122-131)."""
    R = quat_to_rotmat(quats)
    return R * scales[..., None, :]


def covariance_3d(scales: jnp.ndarray, quats: jnp.ndarray, scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space covariance Sigma = R S S^T R^T as the symmetric 6-vector
    (xx, xy, xz, yy, yz, zz) — same packing as `computeCov3D`
    (forward.cu:118-152). Uses the raw (non-normalizing) quat convention.
    Fully scalar form (batched 3x3 matmuls lower poorly on the VPU)."""
    r, x, y, z = quats[..., 0], quats[..., 1], quats[..., 2], quats[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - r * z)
    r02 = 2 * (x * z + r * y)
    r10 = 2 * (x * y + r * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - r * x)
    r20 = 2 * (x * z - r * y)
    r21 = 2 * (y * z + r * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = (scale_modifier * scales[..., 0]) ** 2
    s1 = (scale_modifier * scales[..., 1]) ** 2
    s2 = (scale_modifier * scales[..., 2]) ** 2
    xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=-1)


# ----------------------------------------------------------- depth -> points / normals


def depths_to_points(depth: jnp.ndarray, c2w: jnp.ndarray, tan_fovx, tan_fovy) -> jnp.ndarray:
    """Backproject a depth map to world points (2DGS-style,
    reference utils/graphics_utils.py:141-156).

    Args:
        depth: [H, W] z-depth along camera forward axis.
        c2w: [4, 4] camera-to-world matrix (math convention).
        tan_fovx, tan_fovy: tan(fov/2), python floats or traced scalars.
    Returns:
        [H, W, 3] world points.
    """
    H, W = depth.shape
    fx = W / (2.0 * tan_fovx)
    fy = H / (2.0 * tan_fovy)
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=depth.dtype), jnp.arange(H, dtype=depth.dtype), indexing="xy")
    # Pixel -> camera ray dirs (reference uses intrinsics with principal point W/2, H/2).
    dirs_cam = jnp.stack([(gx - W / 2.0) / fx, (gy - H / 2.0) / fy, jnp.ones_like(gx)], axis=-1)
    rays_d = dirs_cam @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]
    return depth[..., None] * rays_d + rays_o


def depth_to_normal(depth: jnp.ndarray, c2w: jnp.ndarray, tan_fovx, tan_fovy) -> jnp.ndarray:
    """Central-difference world-space normals from a depth map, zero on the 1px border
    (reference utils/graphics_utils.py:158-169)."""
    points = depths_to_points(depth, c2w, tan_fovx, tan_fovy)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = safe_normalize(jnp.cross(dx, dy))
    return jnp.pad(n, ((1, 1), (1, 1), (0, 0)))


def camera_intrinsics(fovx: float, fovy: float, W: int, H: int) -> np.ndarray:
    """3x3 intrinsics with principal point at W/2, H/2 (reference cameras.py:83-90)."""
    fx = fov2focal(fovx, W)
    fy = fov2focal(fovy, H)
    return np.array([[fx, 0, W / 2.0], [0, fy, H / 2.0], [0, 0, 1.0]], dtype=np.float32)
