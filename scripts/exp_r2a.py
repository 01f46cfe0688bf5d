"""r2 experiment batch A: sort payload packing + preprocess-bwd residual probe."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.tputime import timeit  # noqa: E402


def sort_experiments():
    d = 2_450_000
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 1 << 31, d).astype(np.uint32))
    rows = [jnp.asarray(rng.rand(d).astype(np.float32)) for _ in range(10)]

    f = jax.jit(lambda k, *rs: jax.lax.sort((k,) + rs, num_keys=1))
    timeit(f, key, *rows[:9], name="sort u32 key + 9 f32 payloads")

    def packed(k, *rs):
        pairs = [jax.lax.complex(rs[2 * i], rs[2 * i + 1]) for i in range(4)]
        out = jax.lax.sort((k,) + tuple(pairs) + (rs[8],), num_keys=1)
        outs = []
        for p in out[1:5]:
            outs += [jnp.real(p), jnp.imag(p)]
        return out[0], outs, out[5]
    f2 = jax.jit(packed)
    timeit(f2, key, *rows[:9], name="sort u32 key + 4 c64 + 1 f32 (pack+unpack)")

    f3 = jax.jit(lambda k, g: jax.lax.sort((k, g), num_keys=1))
    timeit(f3, key, rows[0], name="sort u32 key + 1 payload (2.45M)")


def preprocess_bwd_probe():
    from bench import build
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess

    n = 1_000_000
    arrs, cam, cfg = build(n, 800, 800)
    means, scales, quats, opac, colors = arrs

    def pre_loss(m, s, q, o):
        pre = preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                         cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
                         cfg.scale_modifier, None, None, o)
        return (jnp.sum(pre.mean2d) + jnp.sum(pre.conic) + jnp.sum(pre.depth)
                + jnp.sum(pre.tiles_touched.astype(jnp.float32)))

    timeit(jax.jit(pre_loss), means, scales, quats, opac, name="preprocess fwd (loss)")
    timeit(jax.jit(jax.grad(pre_loss, argnums=(0, 1, 2, 3))), means, scales, quats,
           opac, name="preprocess fwd+bwd (autodiff)")


def main():
    which = os.environ.get("EXP", "all")
    if which in ("all", "sort"):
        sort_experiments()
    if which in ("all", "pre"):
        preprocess_bwd_probe()


if __name__ == "__main__":
    main()
