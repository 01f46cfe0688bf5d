"""Bisect the composed forward_loss backward: where do ~250ms appear that the
isolated stages (shading 40ms, rasterize 92ms, losses ~5ms) don't explain?

Usage: python scripts/profile_train_bwd.py [n] [res]
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
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.renderer import render
    from relightable3dgaussians_w_tpu.train_step import forward_loss
    from relightable3dgaussians_w_tpu.utils import losses as LO
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
    gt = jnp.asarray(rng.uniform(0, 1, (res, res, 3)), jnp.float32)
    sky_mask = jnp.asarray((rng.uniform(size=(res, res)) > 0.3), jnp.float32)
    occ = jnp.ones((res, res))
    bg3 = jnp.zeros(3)
    key = jax.random.PRNGKey(7)
    envl = jnp.asarray(rng.uniform(0, 0.4, (25, 3)), jnp.float32)
    sky_sh = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4, 3)), jnp.float32)

    def do_render(pg, probe=None):
        return render(pg, gstate, envl, sky_sh, cam, rcfg, bg3, sky_mask,
                      envlight_sh_degree=4, sky_sh_degree=1, specular=True,
                      fix_sky=False, debug=False, mean2d_probe=probe)

    # (a) render-only backward wrt Gaussian params, sum cotangent on .render
    timeit(jax.jit(jax.grad(lambda pg: jnp.sum(do_render(pg).render))),
           params["gaussians"], name="grad sum(render.render) wrt gaussians")

    # (b) + all consumed outputs (render, diffuse, specular, normal, alpha, depth)
    def sum_all(pg):
        o = do_render(pg)
        return (jnp.sum(o.render) + jnp.sum(o.diffuse_color) + jnp.sum(o.specular_color)
                + jnp.sum(o.normal) + jnp.sum(o.alpha) + jnp.sum(o.depth)
                + jnp.sum(o.normal_ref))
    timeit(jax.jit(jax.grad(sum_all)), params["gaussians"],
           name="grad sum(all AOVs) wrt gaussians")

    # (c) rec loss only (L1+SSIM on render)
    def rec_loss(pg):
        o = do_render(pg)
        chw = lambda x: jnp.moveaxis(x, -1, 0)
        image, gtc = chw(o.render), chw(gt)
        occ3 = jnp.broadcast_to(occ[None], image.shape)
        return (LO.l1_loss(image, gtc, mask=occ3) * 0.8
                + 0.2 * (1 - LO.ssim(image, gtc, mask=occ3)))
    timeit(jax.jit(jax.grad(rec_loss)), params["gaussians"],
           name="grad rec(L1+SSIM) wrt gaussians")

    # (d) full forward_loss wrt all params (reference point)
    probe = jnp.zeros((capacity, 2))

    def floss(p):
        l, _ = forward_loss(p, gstate, probe, mlp, cam, gt, sky_mask, occ,
                            jnp.asarray(0), key, jnp.asarray(0), cfg, rcfg, bg3)
        return l
    timeit(jax.jit(jax.grad(floss)), params, name="grad full forward_loss")

    # (e) full forward_loss with probe grads (the train_step form)
    def floss2(p, pr):
        l, _ = forward_loss(p, gstate, pr, mlp, cam, gt, sky_mask, occ,
                            jnp.asarray(0), key, jnp.asarray(0), cfg, rcfg, bg3)
        return l
    timeit(jax.jit(jax.grad(floss2, argnums=(0, 1))), params, probe,
           name="grad forward_loss (+probe)")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    main(n, res)
