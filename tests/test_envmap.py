"""Envmap SH projection / rendering / rotation tests: exact round trips for
band-limited signals and rotation correctness against direct re-evaluation."""

import numpy as np
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.utils import envmap as E
from relightable3dgaussians_w_tpu.utils.sh import sh_basis, eval_sh


def rand_dirs(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def test_project_render_roundtrip():
    rng = np.random.RandomState(0)
    deg = 4
    coeffs = rng.normal(size=(25, 3)) * 0.3
    img = E.render_sh_map(coeffs.astype(np.float32), width=512, convolve_diffuse=False)
    rec = E.project_envmap_to_sh(img, deg)
    np.testing.assert_allclose(rec, coeffs, atol=2e-3)


def test_solid_angles_sum_to_sphere():
    sa = E.solid_angle_map(256)
    np.testing.assert_allclose(sa.sum(), 4 * np.pi, rtol=1e-3)


def test_rotation_matches_reevaluation():
    rng = np.random.RandomState(1)
    deg = 4
    coeffs = rng.normal(size=(25, 3))
    yaw, pitch, roll = 0.7, -0.4, 1.9
    R = E.euler_zyx_matrix(yaw, pitch, roll)
    rotated = E.rotate_sh(coeffs, yaw, pitch, roll)

    d = rand_dirs(50, seed=2).astype(np.float32)
    # f'(d) must equal f(R^T d).
    f_rot = np.asarray(eval_sh(deg, jnp.asarray(rotated.T[None]), jnp.asarray(d)))
    f_orig = np.asarray(eval_sh(deg, jnp.asarray(coeffs.T[None].astype(np.float32)),
                                jnp.asarray((d @ R).astype(np.float32))))
    np.testing.assert_allclose(f_rot, f_orig, atol=1e-4)


def test_rotation_identity_and_composition():
    rng = np.random.RandomState(2)
    coeffs = rng.normal(size=(25, 3))
    np.testing.assert_allclose(E.rotate_sh(coeffs), coeffs, atol=1e-5)
    # Rotation preserves per-band energy (orthogonal within bands).
    rot = E.rotate_sh(coeffs, 0.3, 0.9, -1.2)
    for l in range(5):
        sl = slice(l * l, (l + 1) ** 2)
        np.testing.assert_allclose(
            np.sum(rot[sl] ** 2), np.sum(coeffs[sl] ** 2), rtol=1e-5
        )


def test_diffuse_band_coefficients_reference_values():
    c = E.diffuse_band_coefficients(4)
    np.testing.assert_allclose(c[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(c[1], 2.0 / 3.0, rtol=1e-6)
    np.testing.assert_allclose(c[2], 0.25, rtol=1e-6)
    np.testing.assert_allclose(c[3], 0.0, atol=1e-12)
    np.testing.assert_allclose(c[4], -1.0 / 24.0, rtol=1e-6)
