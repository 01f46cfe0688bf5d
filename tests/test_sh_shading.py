"""SH math + shading layer tests: parity against the reference implementation where
importable, plus independent numerical-integration checks."""

import os
import sys
import types

import numpy as np
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.utils import sh as shmod
from relightable3dgaussians_w_tpu.models import light as lightmod
from relightable3dgaussians_w_tpu.models.brdf_lut import get_fg_lut
from relightable3dgaussians_w_tpu.ops.texture import bilinear_sample

REF = "/root/reference"
has_ref = os.path.isdir(REF)


def rand_dirs(n, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


@pytest.mark.skipif(not has_ref, reason="reference checkout not available")
@pytest.mark.parametrize("deg", [0, 1, 2, 3, 4])
def test_eval_sh_matches_reference(deg):
    # Degree 5 is excluded: the reference's table has two typos there (fixed in our
    # sh.py and validated by test_sh_basis_orthonormal); the reference never uses
    # degree 5 on its training path (envlight deg 4, sky deg 1).
    import torch

    if "utils.sh_utils" not in sys.modules:
        # The reference module chain imports skimage, which isn't installed; only
        # block_reduce is referenced and not on the eval_sh path — stub it.
        fake = types.ModuleType("skimage")
        fake.measure = types.ModuleType("skimage.measure")
        fake.measure.block_reduce = lambda *a, **k: None
        sys.modules.setdefault("skimage", fake)
        sys.modules.setdefault("skimage.measure", fake.measure)
        sys.path.insert(0, REF)
    import utils.sh_utils as ref_sh

    rng = np.random.RandomState(deg)
    n = (deg + 1) ** 2
    coeffs = rng.normal(size=(17, 3, n)).astype(np.float32)
    dirs = rand_dirs(17, seed=deg).astype(np.float32)
    ref = ref_sh.eval_sh(deg, torch.tensor(coeffs), torch.tensor(dirs)).numpy()
    got = np.asarray(shmod.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def quadrature_dirs(n_theta=32, n_phi=128):
    """Gauss-Legendre x uniform-phi spherical quadrature — exact for band-limited
    integrands up to high degree. Returns (dirs [M, 3], weights [M])."""
    x, wx = np.polynomial.legendre.leggauss(n_theta)  # x = cos(theta)
    phi = (np.arange(n_phi) + 0.5) * 2 * np.pi / n_phi
    ct, ph = np.meshgrid(x, phi, indexing="ij")
    st = np.sqrt(1 - ct**2)
    d = np.stack([st * np.cos(ph), st * np.sin(ph), ct], axis=-1).reshape(-1, 3)
    w = np.broadcast_to(wx[:, None], ct.shape).reshape(-1) * (2 * np.pi / n_phi)
    return d, w


def test_sh_basis_orthonormal():
    # Quadrature orthonormality over the sphere: int b_i b_j dOmega = delta_ij.
    d, w = quadrature_dirs()
    B = np.asarray(shmod.sh_basis(5, jnp.asarray(d, jnp.float32)))
    gram = (B * w[:, None]).T @ B
    np.testing.assert_allclose(gram, np.eye(36), atol=2e-4)


def test_gauss_kernel_band_structure():
    kr = jnp.asarray([[0.3], [0.7]])
    k = np.asarray(shmod.gauss_kernel(kr, 4))
    assert k.shape == (2, 25)
    for l in range(5):
        expected = np.exp(-l * (l + 1) * 0.3 * np.asarray(kr)[:, 0])
        for m in range(l * l, (l + 1) ** 2):
            np.testing.assert_allclose(k[:, m], expected, rtol=1e-6)


def test_diffuse_irradiance_matches_numerical_integration():
    # For degree-2 band-limited light, the Ramamoorthi-Hanrahan analytic irradiance
    # must equal the numerical integral of L(w) * max(0, n.w) over the sphere.
    rng = np.random.RandomState(0)
    base = np.zeros((25, 3), dtype=np.float32)
    base[:9] = rng.uniform(0.1, 0.5, size=(9, 3))
    normals = rand_dirs(5, seed=1).astype(np.float32)

    analytic = np.asarray(lightmod.diffuse_irradiance(jnp.asarray(base), jnp.asarray(normals)))

    d, w = quadrature_dirs(64, 256)
    # The Ramamoorthi-Hanrahan constants in the reference (light.py:36-40,65-94)
    # interpret `base` in the POSITIVE-sign real-SH polynomial convention (Y_11 ~ +x
    # etc.), whereas eval_sh uses the PlenOctree signed basis (Y_11 ~ -x). We
    # faithfully replicate the reference, so integrate the light under the
    # positive-sign convention: flip the odd-m signs of our basis.
    B = np.asarray(shmod.sh_basis(2, jnp.asarray(d, jnp.float32)))  # [M, 9]
    B = B * np.array([1, -1, 1, -1, 1, -1, 1, -1, 1])[None, :]
    L = B @ base[:9]  # [M, 3]
    for i, nrm in enumerate(normals):
        cos = np.maximum(d @ nrm, 0.0)
        integral = (L * (cos * w)[:, None]).sum(axis=0)
        np.testing.assert_allclose(analytic[i], integral, rtol=0.02, atol=5e-3)


@pytest.mark.skipif(not has_ref, reason="reference checkout not available")
def test_fg_lut_matches_reference_blob():
    ref = np.fromfile(
        os.path.join(REF, "scene/NVDIFFREC/irrmaps/bsdf_256_256.bin"), dtype=np.float32
    ).reshape(256, 256, 2)
    lut = get_fg_lut()
    assert np.abs(lut - ref).max() < 2e-2
    assert np.abs(lut - ref).mean() < 1e-3


def test_bilinear_sample_matches_numpy():
    rng = np.random.RandomState(0)
    tex = rng.uniform(size=(256, 256, 2)).astype(np.float32)
    uv = rng.uniform(size=(100, 2)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(tex), jnp.asarray(uv)))

    u = uv[:, 0] * 256 - 0.5
    v = uv[:, 1] * 256 - 0.5
    u0 = np.floor(u).astype(int)
    v0 = np.floor(v).astype(int)
    fu, fv = u - u0, v - v0
    c = lambda x: np.clip(x, 0, 255)
    ref = (
        tex[c(v0), c(u0)] * ((1 - fu) * (1 - fv))[:, None]
        + tex[c(v0), c(u0 + 1)] * (fu * (1 - fv))[:, None]
        + tex[c(v0 + 1), c(u0)] * ((1 - fu) * fv)[:, None]
        + tex[c(v0 + 1), c(u0 + 1)] * (fu * fv)[:, None]
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_bilinear_sample_packed_matches_unpacked():
    """One-gather quad sampler == 4-gather sampler, including the clamped borders
    (uv outside [0,1] and the sub-texel-0 left/top edge)."""
    from relightable3dgaussians_w_tpu.ops.texture import (
        bilinear_sample_packed, pack_bilinear_quads)

    rng = np.random.RandomState(1)
    tex = rng.uniform(size=(64, 32, 3)).astype(np.float32)
    uv = np.concatenate([
        rng.uniform(-0.2, 1.2, size=(200, 2)),                   # incl. out of range
        np.array([[0.0, 0.0], [1.0, 1.0], [0.004, 0.5], [0.5, 0.004]]),
    ]).astype(np.float32)
    quad = pack_bilinear_quads(tex)
    a = np.asarray(bilinear_sample(jnp.asarray(tex), jnp.asarray(uv)))
    b = np.asarray(bilinear_sample_packed(jnp.asarray(quad), jnp.asarray(uv)))
    # Same taps and combine; XLA may form fmas differently across the two
    # programs, so allow 1-ulp noise.
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=3e-7)


def test_minimum_axis_matches_gather():
    """Where-select formulation == take_along_axis(argmin), incl. exact ties."""
    from relightable3dgaussians_w_tpu.utils.general import get_minimum_axis

    rng = np.random.RandomState(2)
    scales = rng.uniform(0.1, 2.0, size=(64, 3)).astype(np.float32)
    scales[10] = [0.5, 0.5, 1.0]   # tie 0-1
    scales[11] = [1.0, 0.5, 0.5]   # tie 1-2
    scales[12] = [0.5, 0.5, 0.5]   # tie all
    R = rng.normal(size=(64, 3, 3)).astype(np.float32)
    got = np.asarray(get_minimum_axis(jnp.asarray(scales), jnp.asarray(R)))
    idx = np.argmin(scales, axis=-1)
    ref = R[np.arange(64), :, idx]
    np.testing.assert_array_equal(got, ref)


def test_shade_shapes_and_paths():
    rng = np.random.RandomState(0)
    n = 64
    base = jnp.asarray(rng.uniform(0, 0.5, (25, 3)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    normals = jnp.asarray(rand_dirs(n), jnp.float32)
    albedo = jnp.asarray(rng.uniform(0.2, 0.9, (n, 3)), jnp.float32)
    kr = jnp.asarray(rng.uniform(0.1, 0.9, (n, 1)), jnp.float32)
    km = jnp.asarray(rng.uniform(0.0, 1.0, (n, 1)), jnp.float32)
    view = jnp.asarray([0.0, 0.0, -3.0])

    out = lightmod.shade(base, 4, pos, normals, albedo, view, kr, km, specular=True)
    assert out.rgb.shape == (n, 3)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert (np.asarray(out.rgb) >= 0).all() and (np.asarray(out.rgb) <= 1.0 + 1e-3).all()

    out_diff = lightmod.shade(base, 4, pos, normals, albedo, view, specular=False)
    assert np.allclose(np.asarray(out_diff.specular), 0)
