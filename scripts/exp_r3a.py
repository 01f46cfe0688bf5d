"""r3 experiment batch A: the preprocess-staging seam on the full bench graph.

Variants:
  fused  — one jitted program (r2 bench default), grad wrt all 5 inputs
  split  — make_rasterize_grad_split: 3 dispatches, preprocess outputs staged
  barrier— one program, optimization_barrier on the preprocess outputs (does a
           scheduling fence alone fix the pathology without the dispatch split?)
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tputime import timeit  # noqa: E402


def main():
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import (
        rasterize, make_rasterize_grad_split)
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess

    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    bg = jnp.zeros(3, jnp.float32)
    which = os.environ.get("EXP", "fused,split,barrier").split(",")

    def img_loss(img, aux):
        return jnp.sum(img) + jnp.sum(aux.alpha)

    if "fused" in which:
        def loss_fn(m, s, q, o, c):
            img, aux = rasterize(m, s, q, o, c, bg, cam, cfg)
            return img_loss(img, aux)

        timeit(jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))), *arrs,
               name="fused one-program grad")

    if "split" in which:
        split_step = make_rasterize_grad_split(cam, cfg, img_loss)
        timeit(lambda *a: split_step(*a, bg)[1], *arrs,
               name="split 3-dispatch grad")

    if "barrier" in which:
        def loss_barrier(m, s, q, o, c):
            pre = preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                             cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                             cfg.scale_modifier, None, None, o)
            pre = jax.tree_util.tree_map(jax.lax.optimization_barrier, pre)
            img, aux = rasterize(m, s, q, o, c, bg, cam, cfg, pre=pre)
            return img_loss(img, aux)

        timeit(jax.jit(jax.grad(loss_barrier, argnums=(0, 1, 2, 3, 4))), *arrs,
               name="one-program grad + optimization_barrier")


if __name__ == "__main__":
    main()
