"""Parity of the 3-dispatch split rasterizer grads vs the fused one-program grad.

The split (ops/rasterize.py make_rasterize_grad_split) exists purely for XLA
scheduling performance on v5e; gradients must be identical to jax.grad of the fused
graph (same ops, same order — only the dispatch boundaries differ).
"""

import jax
import jax.numpy as jnp
import numpy as np

from relightable3dgaussians_w_tpu.ops.rasterize import (
    rasterize, make_rasterize_grad_split)

from test_rasterize import make_scene


def test_split_grads_match_fused():
    arrs, cam, cfg, _ = make_scene(n=300, seed=3)

    def img_loss(img, aux):
        # Non-uniform cotangents exercise every gradient chain.
        w = jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape) * 1e-3
        return jnp.sum(img * w) + jnp.sum(aux.alpha)

    def loss_fn(m, s, q, o, c):
        img, aux = rasterize(m, s, q, o, c, arrs["bg"], cam, cfg)
        return img_loss(img, aux)

    args = (arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
            arrs["colors"])
    g_fused = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))(*args)

    split_step = make_rasterize_grad_split(cam, cfg, img_loss)
    loss, g_split, overflow = split_step(*args, arrs["bg"])

    assert int(overflow) == 0
    assert np.isfinite(float(loss))
    for a, b, name in zip(g_fused, g_split,
                          ["means", "scales", "quats", "opac", "colors"]):
        # Same math, different dispatch boundaries: XLA fuses/reassociates f32
        # sums differently across the seam, so compare at an array-scale
        # tolerance (matches tests/test_rasterize.py's grad-parity convention).
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=0, err_msg=name)
