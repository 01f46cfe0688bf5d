"""r4 probe B: does Mosaic support a usable in-VMEM dynamic row gather?

The r3 roofline pinned binning+gather+segsum at a ~45 ms XLA-primitive floor and
named its only escape "a Mosaic radix-partition kernel moving 64-byte feature
rows at HBM rate", which needs an in-VMEM dynamic permute. This probe measures,
on the real chip:

  1. XLA row gather baseline (the 7.4 ns/row primitive we want to beat)
  2. Pallas kernel: out = table[idx, :] with a traced index vector (Mosaic
     dynamic gather along sublanes), tables resident in VMEM
  3. Pallas kernel: per-row fori_loop of dynamic slices (expected dead)
  4. lax.sort payload rate for reference

Run: python scripts/exp_r4b.py  (TPU)
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # pull a scalar to defeat the axon async quirk
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1]).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters


def main():
    R, F = 16384, 16       # rows resident in VMEM (16384*16*4 = 1 MB table)
    reps = 8               # grid steps reusing the same table

    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (R, F), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (R,), 0, R, jnp.int32)

    # --- 1. XLA gather baseline at real scale -------------------------------
    N, D = 1_000_000, 2_621_440
    big = jax.random.normal(key, (N, F), jnp.float32)
    gid = jax.random.randint(jax.random.fold_in(key, 2), (D,), 0, N, jnp.int32)
    t = timeit(jax.jit(lambda T, g: T[g]), big, gid, iters=5)
    print(f"XLA gather {D} rows x{F}f32: {t*1e3:.2f} ms  ({t/D*1e9:.2f} ns/row)")

    # --- 2. Mosaic dynamic gather (vector index) ----------------------------
    def gather_kernel(idx_ref, tab_ref, out_ref):
        ii = idx_ref[:]                       # [R] int32 in VMEM
        acc = tab_ref[ii, :]                  # dynamic row gather
        out_ref[:] = acc

    try:
        fn = pl.pallas_call(
            gather_kernel,
            grid=(reps,),
            in_specs=[pl.BlockSpec((R,), lambda i: (0,), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        )
        t = timeit(jax.jit(lambda i_, t_: fn(i_, t_)), idx, table, iters=20)
        per_row = t / (R * reps) * 1e9
        print(f"Mosaic [idx,:] gather {R} rows x{reps} reps: {t*1e3:.3f} ms  "
              f"({per_row:.2f} ns/row)")
    except Exception as e:
        print(f"Mosaic [idx,:] gather FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- 2b. jnp.take variant ----------------------------------------------
    def take_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    try:
        fn = pl.pallas_call(
            take_kernel,
            grid=(reps,),
            in_specs=[pl.BlockSpec((R,), lambda i: (0,), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        )
        t = timeit(jax.jit(lambda i_, t_: fn(i_, t_)), idx, table, iters=20)
        per_row = t / (R * reps) * 1e9
        print(f"Mosaic jnp.take axis0 {R} rows x{reps} reps: {t*1e3:.3f} ms  "
              f"({per_row:.2f} ns/row)")
    except Exception as e:
        print(f"Mosaic jnp.take FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- 2c. lane-major gather: table [F, R] gathered along LANES -----------
    tableT = jnp.asarray(np.asarray(table).T.copy())  # [F, R]

    def lane_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=1)

    try:
        fn = pl.pallas_call(
            lane_kernel,
            grid=(reps,),
            in_specs=[pl.BlockSpec((R,), lambda i: (0,), memory_space=pltpu.VMEM),
                      pl.BlockSpec((F, R), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((F, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((F, R), jnp.float32),
        )
        t = timeit(jax.jit(lambda i_, t_: fn(i_, t_)), idx, tableT, iters=20)
        per_row = t / (R * reps) * 1e9
        print(f"Mosaic take axis1 (lanes) {R} cols x{reps} reps: {t*1e3:.3f} ms  "
              f"({per_row:.2f} ns/row)")
    except Exception as e:
        print(f"Mosaic take axis1 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- 3. per-row dynamic-slice loop (expected dead) ----------------------
    def loop_kernel(idx_ref, tab_ref, out_ref):
        def body(j, _):
            out_ref[pl.ds(j, 1), :] = tab_ref[pl.ds(idx_ref[j], 1), :]
            return 0
        jax.lax.fori_loop(0, 2048, body, 0)

    try:
        fn = pl.pallas_call(
            loop_kernel,
            grid=(1,),
            in_specs=[pl.BlockSpec((R,), lambda i: (0,), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        )
        t = timeit(jax.jit(lambda i_, t_: fn(i_, t_)), idx, table, iters=20)
        print(f"Mosaic per-row loop 2048 rows: {t*1e3:.3f} ms  "
              f"({t/2048*1e9:.1f} ns/row)")
    except Exception as e:
        print(f"Mosaic per-row loop FAILED: {type(e).__name__}: {str(e)[:300]}")

    # --- 3b. dynamic SCATTER rows (out_ref[idx] = rows) ---------------------
    def scatter_kernel(idx_ref, tab_ref, out_ref):
        out_ref[idx_ref[:], :] = tab_ref[:]

    try:
        fn = pl.pallas_call(
            scatter_kernel,
            grid=(reps,),
            in_specs=[pl.BlockSpec((R,), lambda i: (0,), memory_space=pltpu.VMEM),
                      pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        )
        t = timeit(jax.jit(lambda i_, t_: fn(i_, t_)), idx, table, iters=20)
        per_row = t / (R * reps) * 1e9
        print(f"Mosaic row scatter {R} rows x{reps} reps: {t*1e3:.3f} ms  "
              f"({per_row:.2f} ns/row)")
    except Exception as e:
        print(f"Mosaic row scatter FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
