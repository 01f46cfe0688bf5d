"""Stage-level timing of the full training step (bench_train_step scene) on TPU:
shading (compute_colors), rasterize @ train channel count, loss stack, Adam.

Usage: python scripts/profile_train_step.py [n] [res]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.tputime import timeit


def main(n=500_000, res=800):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig, rasterize
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.renderer import render, compute_colors
    from relightable3dgaussians_w_tpu.train_step import (
        TrainState, forward_loss, make_train_fns, make_optimizer)
    from __graft_entry__ import _camera

    rng = np.random.RandomState(0)
    cam = _camera(res, res)
    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-2.5, 2.5, n),
                    rng.uniform(1.0, 10.0, n)], -1).astype(np.float32)
    capacity = ((n + 4095) // 4096) * 4096
    params_g, gstate = G.init_from_points(pts, np.full(n, 5e-5, np.float32), capacity)

    total = int(jax.jit(lambda m, s, q, o: jnp.sum(preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        res, res, 16, opacities=o).tiles_touched))(
        params_g.xyz, jnp.exp(params_g.scaling), params_g.rotation,
        jax.nn.sigmoid(params_g.opacity)))
    max_dup = min(max(((int(total * 1.3) + 4095) // 4096) * 4096, 4096), 1 << 23)
    print(f"n={n} res={res} entries~{total} max_dup={max_dup}")

    rcfg = RasterizerConfig(width=res, height=res, max_dup=max_dup,
                            max_tiles_per_gauss=0, lmax_per_tile=4096, tile_chunk=8,
                            use_pallas=jax.default_backend() == "tpu")
    cfg = Config()
    mlp = MLPNet()
    k = jax.random.PRNGKey(0)
    params = {"gaussians": params_g, "mlp": init_mlp(k, mlp),
              "embeddings": init_embeddings(jax.random.fold_in(k, 1), 8)}
    state = TrainState(params, gstate, make_optimizer().init(params), jnp.asarray(0))
    fns = make_train_fns(mlp, cfg, rcfg)

    gt = jnp.asarray(rng.uniform(0, 1, (res, res, 3)), jnp.float32)
    sky_mask = jnp.asarray((rng.uniform(size=(res, res)) > 0.3), jnp.float32)
    occ = jnp.ones((res, res))
    bg3 = jnp.zeros(3)
    key = jax.random.PRNGKey(7)
    envl = jnp.asarray(rng.uniform(0, 0.4, (25, 3)), jnp.float32)
    sky_sh = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4, 3)), jnp.float32)

    # --- shading only (fwd) and (fwd+bwd wrt params)
    def colors_fwd(p):
        c, _ = compute_colors(p, gstate, envl, sky_sh, 4, 1, cam.campos,
                              specular=True, fix_sky=False, debug=False)
        return c

    timeit(jax.jit(colors_fwd), params["gaussians"], name="compute_colors fwd")
    timeit(jax.jit(jax.grad(lambda p: jnp.sum(colors_fwd(p)))), params["gaussians"], name="compute_colors fwd+bwd")

    # --- rasterize @ train channels (13), active mask, probe
    colors13 = jax.jit(colors_fwd)(params["gaussians"])
    xyz = G.get_xyz(params["gaussians"], gstate)
    scales = G.get_scaling(params["gaussians"])
    quats = G.get_rotation(params["gaussians"])
    opac = G.get_opacity(params["gaussians"], gstate)
    bg13 = jnp.zeros(13)

    def rast_loss(x, s, q, o, c):
        img, aux = rasterize(x, s, q, o, c, bg13, cam, rcfg, active=gstate.alive)
        return jnp.sum(img) + jnp.sum(aux.alpha)

    timeit(jax.jit(lambda *a: rast_loss(*a)), xyz, scales, quats, opac, colors13, name="rasterize fwd (13ch)")
    timeit(jax.jit(jax.grad(rast_loss, argnums=(0, 1, 2, 3, 4))),
           xyz, scales, quats, opac, colors13, name="rasterize fwd+bwd (13ch)")

    # --- full forward_loss fwd+bwd (no Adam)
    probe = jnp.zeros((capacity, 2))

    def floss(p):
        (l, _aux) = forward_loss(p, gstate, probe, mlp, cam, gt, sky_mask, occ,
                                 jnp.asarray(0), key, jnp.asarray(0), cfg, rcfg, bg3)
        return l

    timeit(jax.jit(floss), params, name="forward_loss fwd")
    timeit(jax.jit(jax.grad(floss)), params, name="forward_loss fwd+bwd")

    # --- full train step
    timeit(jax.jit(lambda st: fns.train_step(
        st, cam, gt, sky_mask, occ, jnp.asarray(0), key, bg3)), state, name="train_step full")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    main(n, res)
