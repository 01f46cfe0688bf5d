"""Legacy cubemap light tests: cube mapping round trip, mip energy conservation,
constant-environment shading sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.models import light_cubemap as CL


def test_cube_dir_roundtrip():
    rng = np.random.RandomState(0)
    d = rng.normal(size=(500, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    face, u, v = CL.dir_to_cube(jnp.asarray(d, jnp.float32))
    face, u, v = np.asarray(face), np.asarray(u), np.asarray(v)
    for f in range(6):
        m = face == f
        if not m.any():
            continue
        back = np.array(CL.cube_to_dir(f, jnp.asarray(u[m] * 2 - 1), jnp.asarray(v[m] * 2 - 1)))
        back /= np.linalg.norm(back, axis=-1, keepdims=True)
        np.testing.assert_allclose(back, d[m], atol=1e-5)


def test_sample_constant_cubemap():
    cm = jnp.full((6, 32, 32, 3), 0.7)
    d = np.random.RandomState(1).normal(size=(100, 3)).astype(np.float32)
    out = np.asarray(CL.sample_cubemap(cm, jnp.asarray(d)))
    np.testing.assert_allclose(out, 0.7, atol=1e-6)


def test_mip_preserves_mean():
    rng = np.random.RandomState(2)
    cm = jnp.asarray(rng.uniform(size=(6, 64, 64, 3)), jnp.float32)
    m = CL.cubemap_mip(cm)
    assert m.shape == (6, 32, 32, 3)
    np.testing.assert_allclose(float(m.mean()), float(cm.mean()), rtol=1e-6)


def test_constant_environment_shading():
    # Under a constant white environment, diffuse irradiance ~= 1 and the split-sum
    # specular ~= F0*A + B <= ~1; shading must be finite and near diff+spec budget.
    base = jnp.full((6, 64, 64, 3), 1.0)
    mips = CL.build_mips(base)
    np.testing.assert_allclose(np.asarray(mips.diffuse), 1.0, atol=2e-2)

    rng = np.random.RandomState(3)
    n = 32
    pos = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    nrm = rng.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    kd = jnp.asarray(rng.uniform(0.2, 0.8, (n, 3)), jnp.float32)
    ks = jnp.asarray(np.stack([np.zeros(n), rng.uniform(0.1, 0.9, n),
                               rng.uniform(0, 1, n)], -1), jnp.float32)
    out = CL.shade_cubemap(mips, pos, jnp.asarray(nrm, jnp.float32), kd, ks,
                           jnp.zeros(3))
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out < 2.5).all()
