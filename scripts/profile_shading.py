"""Micro-profile of compute_colors internals at pool scale on TPU.

Usage: python scripts/profile_shading.py [n]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.tputime import timeit


def main(n=500_000):
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.models import light as L
    from relightable3dgaussians_w_tpu.models.light import (
        diffuse_irradiance, specular_light_sh, safe_normalize, reflect,
        get_fg_lut, gamma_correction)
    from relightable3dgaussians_w_tpu.ops.texture import bilinear_sample
    from relightable3dgaussians_w_tpu.utils.sh import eval_sh

    rng = np.random.RandomState(0)
    capacity = ((n + 4095) // 4096) * 4096
    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-2.5, 2.5, n),
                    rng.uniform(1.0, 10.0, n)], -1).astype(np.float32)
    params_g, gstate = G.init_from_points(pts, np.full(n, 5e-5, np.float32), capacity)
    envl = jnp.asarray(rng.uniform(0, 0.4, (25, 3)), jnp.float32)
    campos = jnp.asarray([0.0, 0.0, -1.0])

    xyz = G.get_xyz(params_g, gstate)
    albedo = G.get_albedo(params_g)
    kr = G.get_roughness(params_g)
    km = G.get_metalness(params_g)
    dirs = jnp.asarray(rng.normal(size=(capacity, 3)), jnp.float32)
    normals = jax.jit(safe_normalize)(dirs)
    lut = jnp.asarray(get_fg_lut())

    timeit(jax.jit(lambda p, d: G.get_normal(p, d)), params_g, normals,
           name="get_normal")
    timeit(jax.jit(lambda b, nr: diffuse_irradiance(b, nr)), envl, normals,
           name="diffuse_irradiance")
    timeit(jax.jit(lambda b, r: specular_light_sh(b, r, 4)), envl, kr,
           name="specular_light_sh [N,25,3]")

    def spec_eval(b, r, refl):
        sh = specular_light_sh(b, r, 4)
        return eval_sh(4, jnp.swapaxes(sh, 1, 2), refl)
    timeit(jax.jit(spec_eval), envl, kr, normals, name="spec conv + eval_sh")

    def lutpath(x, nr, r):
        wo = safe_normalize(campos[None] - x)
        ndotv = jnp.clip(jnp.sum(wo * nr, axis=-1, keepdims=True), 1e-4, None)
        return bilinear_sample(lut, jnp.concatenate([ndotv, r], axis=-1))
    timeit(jax.jit(lutpath), xyz, normals, kr, name="FG LUT bilinear_sample")

    def full_shade(x, nr, a, r, m):
        return L.shade(envl, 4, x, nr, a, campos, r, m, specular=True)
    timeit(jax.jit(lambda *a: full_shade(*a).rgb), xyz, normals, albedo, kr, km,
           name="shade() full")

    timeit(jax.jit(lambda p, st: G.get_xyz(p, st)), params_g, gstate, name="get_xyz")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500_000)
