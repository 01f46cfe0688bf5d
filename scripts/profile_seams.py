"""Stop-gradient seam bisect of the composed render backward: which coupling
(colors-from-params, normals-from-(scales,quats), depth-from-xyz) blows up the
composed program vs the isolated stages?

Usage: python scripts/profile_seams.py [n] [res]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.tputime import timeit


def main(n=500_000, res=800):
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig, rasterize
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.renderer import compute_colors
    from __graft_entry__ import _camera

    rng = np.random.RandomState(0)
    cam = _camera(res, res)
    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-2.5, 2.5, n),
                    rng.uniform(1.0, 10.0, n)], -1).astype(np.float32)
    capacity = ((n + 4095) // 4096) * 4096
    params_g, gstate = G.init_from_points(pts, np.full(n, 5e-5, np.float32), capacity)
    envl = jnp.asarray(rng.uniform(0, 0.4, (25, 3)), jnp.float32)
    sky_sh = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4, 3)), jnp.float32)
    bg13 = jnp.zeros(13)

    total = int(jax.jit(lambda m, s, q, o: jnp.sum(preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        res, res, 16, opacities=o).tiles_touched))(
        params_g.xyz, jnp.exp(params_g.scaling), params_g.rotation,
        jax.nn.sigmoid(params_g.opacity)))
    max_dup = min(max(((int(total * 1.3) + 4095) // 4096) * 4096, 4096), 1 << 23)
    rcfg = RasterizerConfig(width=res, height=res, max_dup=max_dup,
                            max_tiles_per_gauss=0, lmax_per_tile=4096, tile_chunk=8,
                            use_pallas=jax.default_backend() == "tpu")
    print(f"n={n} res={res} entries~{total} max_dup={max_dup}")

    sg = jax.lax.stop_gradient

    def pipeline(pg, stop_colors=False, stop_geom=False):
        xyz = G.get_xyz(pg, gstate)
        scales = G.get_scaling(pg)
        quats = G.get_rotation(pg)
        opac = G.get_opacity(pg, gstate)
        colors, _ = compute_colors(pg, gstate, envl, sky_sh, 4, 1, cam.campos,
                                   True, False, False)
        depth_g = xyz @ cam.viewmat[2, :3] + cam.viewmat[2, 3]
        colors = colors.at[:, 9].set(depth_g)
        if stop_colors:
            colors = sg(colors)
        if stop_geom:
            xyz, scales, quats, opac = sg(xyz), sg(scales), sg(quats), sg(opac)
        img, aux = rasterize(xyz, scales, quats, opac, colors, bg13, cam, rcfg,
                             active=gstate.alive)
        return jnp.sum(img)

    timeit(jax.jit(jax.grad(lambda p: pipeline(p, stop_colors=True))), params_g,
           name="grad: geometry only (colors stopped)")
    timeit(jax.jit(jax.grad(lambda p: pipeline(p, stop_geom=True))), params_g,
           name="grad: colors only (geometry stopped)")
    timeit(jax.jit(jax.grad(lambda p: pipeline(p))), params_g,
           name="grad: both (composed)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    main(n, res)
