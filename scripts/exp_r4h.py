"""r4 probe H: Pallas tile-histogram vs the XLA step-mask matmul, isolated.

RESULT (1M, 800^2, v5e): XLA 3.06 ms / Pallas 3.15 ms, bitwise equal — the
fused-mask kernel does NOT win; XLA already fuses the step masks into the
dot and the shared cost is generating the [grid, N] masks themselves. The
kernel lives only here (production keeps the XLA form, ops/binning.py).

Motivation was exp_r3c's 3.85 ms reading against ~0.1 ms of MXU flops — the
hypothesis (mask intermediates round-tripping HBM) is falsified above.

Run: python scripts/exp_r4h.py  (TPU)
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build
from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
from relightable3dgaussians_w_tpu.ops.binning import tile_histogram
from scripts.tputime import timeit


import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 4096  # Gaussians per grid step


def _kernel(tab_ref, out_ref, *, grid_x, grid_y):
    i = pl.program_id(0)
    x0 = tab_ref[0:1, :]
    y0 = tab_ref[1:2, :]
    x1 = tab_ref[2:3, :]
    y1 = tab_ref[3:4, :]
    alive = tab_ref[4:5, :] > 0.0
    tx = jax.lax.broadcasted_iota(jnp.int32, (grid_x, 1), 0).astype(jnp.float32)
    ty = jax.lax.broadcasted_iota(jnp.int32, (grid_y, 1), 0).astype(jnp.float32)
    sy = ((y0 <= ty) & (ty < y1) & alive).astype(jnp.bfloat16)   # [gy, B]
    sx = ((x0 <= tx) & (tx < x1) & alive).astype(jnp.bfloat16)   # [gx, B]
    acc = jax.lax.dot_general(sy, sx, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += acc


def tile_histogram_pallas(pre, grid_x, grid_y, interpret=False):
    n = pre.tiles_touched.shape[0]
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    alive = (pre.tiles_touched > 0).astype(jnp.float32)
    tab = jnp.stack([
        pre.rect_min[:, 0].astype(jnp.float32),
        pre.rect_min[:, 1].astype(jnp.float32),
        pre.rect_max[:, 0].astype(jnp.float32),
        pre.rect_max[:, 1].astype(jnp.float32),
        alive,
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    ], axis=0)                                                  # [8, N]
    if n_pad != n:
        tab = jnp.pad(tab, ((0, 0), (0, n_pad - n)))            # alive=0 rows
    kernel = functools.partial(_kernel, grid_x=grid_x, grid_y=grid_y)
    counts2d = pl.pallas_call(
        kernel,
        grid=(n_pad // BLOCK,),
        in_specs=[pl.BlockSpec((8, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((grid_y, grid_x), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid_y, grid_x), jnp.float32),
        interpret=interpret,
    )(tab)
    return counts2d.reshape(-1).astype(jnp.int32)



def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    pre = jax.jit(lambda m, s, q, o: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None, o))(
            means, scales, quats, opac)
    pre = jax.block_until_ready(pre)

    ref, t_x = timeit(jax.jit(lambda p: tile_histogram(p, cfg.grid_x, cfg.grid_y)),
                      pre, name="tile_histogram XLA")
    ker, t_p = timeit(jax.jit(lambda p: tile_histogram_pallas(p, cfg.grid_x,
                                                              cfg.grid_y)),
                      pre, name="tile_histogram Pallas")
    eq = bool(np.array_equal(np.asarray(ref), np.asarray(ker)))
    print(f"bitwise equal: {eq}  total entries: {int(np.asarray(ref).sum())}",
          flush=True)
    assert eq


if __name__ == "__main__":
    main()
