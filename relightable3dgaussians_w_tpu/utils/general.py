"""General math / scheduling helpers, pure jnp + numpy.

TPU-native equivalent of the reference's `utils/general_utils.py` helpers used on the
training path: inverse sigmoid, the log-lerp lr schedule, the densify grad-threshold
annealing, minimum-covariance-axis normals with view flipping, hemisphere sampling, and
polar/cartesian conversions for sky Gaussians. Random sampling takes explicit
`jax.random` keys instead of global torch RNG state.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def grad_thr_exp_scheduling(it, max_iter, grad_thr_start, grad_thr_end=0.0004):
    """Log-linear anneal of the densification gradient threshold
    (reference utils/general_utils.py:24-25)."""
    t = it / max_iter
    return float(np.exp(np.log(grad_thr_start) * (1 - t) + np.log(grad_thr_end) * t))


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000):
    """Log-lerp (exponential) lr schedule with optional sine-eased delay; returns 0 when
    lr_init == lr_final == 0 (reference utils/general_utils.py:46-80). jnp-traceable in
    `step` so it can live inside a jitted train step via optax.inject_hyperparams."""
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)


def get_minimum_axis(scales: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """Column of R corresponding to the smallest scale — the splat's normal direction
    before view alignment (reference utils/general_utils.py:158-161).

    Args:
        scales: [N, 3] positive scales.
        R: [N, 3, 3] rotation matrices (columns = principal axes).
    Returns:
        [N, 3]
    """
    # Two where-selects instead of take_along_axis: a per-element gather at pool
    # scale costs ~20 ms on v5e (scripts/profile_shading.py), the selects ~0.1 ms.
    # Tie-breaking matches argmin (first minimum wins): <= keeps the earlier axis.
    s0, s1, s2 = scales[..., 0:1], scales[..., 1:2], scales[..., 2:3]
    c0, c1, c2 = R[..., 0], R[..., 1], R[..., 2]  # columns = principal axes [N, 3]
    first01 = s0 <= s1
    ax01 = jnp.where(first01, c0, c1)
    s01 = jnp.where(first01, s0, s1)
    return jnp.where(s01 <= s2, ax01, c2)


def flip_align_view(normal: jnp.ndarray, viewdir: jnp.ndarray):
    """Flip normals to face the camera: keep n if dot(n, -viewdir) >= 0 else -n
    (reference utils/general_utils.py:164-170). viewdir points from camera to point."""
    dotprod = jnp.sum(normal * -viewdir, axis=-1, keepdims=True)
    non_flip = dotprod >= 0
    return jnp.where(non_flip, normal, -normal), non_flip


def sample_points_on_unit_hemisphere(key, num_points: int) -> jnp.ndarray:
    """Sample points on the upper portion of the unit hemisphere in COLMAP coords
    (y down): y in [-0.5, 0), phi in [-pi/4, pi/4]
    (reference utils/general_utils.py:229-240). Used to seed sky Gaussians."""
    ky, kphi = jax.random.split(key)
    y = -0.5 * jax.random.uniform(ky, (num_points,))
    theta = jnp.arccos(y)
    phi = (jnp.pi / 2) * jax.random.uniform(kphi, (num_points,)) - jnp.pi / 4
    x = jnp.sin(phi) * jnp.sin(theta)
    z = jnp.sin(theta) * jnp.cos(phi)
    return jnp.stack([x, y, z], axis=-1)


def fibonacci_sphere(num_points: int) -> np.ndarray:
    """Uniform points on the sphere via the Fibonacci lattice
    (reference utils/general_utils.py:209-224). Host-side numpy."""
    phi = math.pi * (3.0 - math.sqrt(5.0))
    N = (num_points - 1) / 2
    i = np.linspace(-N, N, num_points, dtype=np.float64)
    lat = np.arcsin(2.0 * i / (2 * N + 1))
    lon = phi * i
    x = np.cos(lon) * np.cos(lat)
    y = np.sin(lon) * np.cos(lat)
    z = np.sin(lat)
    return np.stack([x, y, z], axis=-1).astype(np.float32)


def rand_hemisphere_dir(key, N: int, n: jnp.ndarray) -> jnp.ndarray:
    """Cosine-weighted random directions on hemispheres oriented around normals n
    (reference utils/general_utils.py:181-206; used by the envlight negativity loss).

    Args:
        key: PRNG key.
        N: samples per normal.
        n: [L, 3] normals.
    Returns:
        [L, N, 3]
    """
    L = n.shape[0]
    rand = jax.random.uniform(key, (L, N, 3))
    normals = jnp.broadcast_to(n[:, None, :], (L, N, 3))
    phi = 2 * jnp.pi * rand[..., 1]
    d0 = jnp.cos(phi) * jnp.sqrt(rand[..., 0])
    d1 = jnp.sin(phi) * jnp.sqrt(rand[..., 0])
    d2 = jnp.sqrt(jnp.clip(1.0 - d0 * d0 - d1 * d1, 0.0, 1.0))
    tangent = rand / (jnp.linalg.norm(rand, axis=-1, keepdims=True) + 1e-12)
    bitangent = jnp.cross(tangent, normals)
    return tangent * d0[..., None] + bitangent * d1[..., None] + normals * d2[..., None]


def cartesian_to_polar(xyz: jnp.ndarray, center: jnp.ndarray, radius) -> jnp.ndarray:
    """(theta, phi) sky-sphere angles of points on a sphere at `center` with `radius`
    (COLMAP coords, y down; reference utils/general_utils.py:295-299)."""
    theta = jnp.arccos(jnp.clip((-xyz[..., 1] + center[1]) / radius, -1, 1))
    phi = jnp.arctan2(xyz[..., 0] - center[0], xyz[..., 2] - center[2])
    return jnp.stack([theta, phi], axis=-1)


def polar_to_cartesian(angles: jnp.ndarray, center: jnp.ndarray, radius) -> jnp.ndarray:
    """Inverse of cartesian_to_polar: sky (theta, phi) -> xyz on the sky sphere
    (matches the fg/sky merge in reference scene/gaussian_model.py:84-103)."""
    theta, phi = angles[..., 0], angles[..., 1]
    x = radius * jnp.sin(theta) * jnp.sin(phi) + center[0]
    y = -radius * jnp.cos(theta) + center[1]
    z = radius * jnp.sin(theta) * jnp.cos(phi) + center[2]
    return jnp.stack([x, y, z], axis=-1)
