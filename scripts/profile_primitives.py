"""Empirical XLA-on-TPU primitive costs at rasterizer shapes (pull-timed, axon-safe).

Informs the binning/gather design (see BENCH_LOG.md "primitive costs" table).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.tputime import timeit


def main():
    d = 4_834_304
    n = 1_000_000
    rng = np.random.RandomState(0)
    key = jnp.asarray(rng.randint(0, 1 << 31, d).astype(np.uint32))
    idx_n = jnp.asarray(rng.randint(0, n, d).astype(np.int32))
    perm = jnp.asarray(rng.permutation(d).astype(np.int32))

    # Sort with varying payload width.
    for k in (1, 2, 4, 8, 16):
        pay = tuple(jnp.asarray(rng.rand(d).astype(np.float32)) for _ in range(k))
        f = jax.jit(lambda kk, *ps: jax.lax.sort((kk,) + ps, num_keys=1))
        timeit(f, key, *pay, iters=5, name=f"sort u32 + {k} f32 payloads")

    # Row gather with varying width, from a 1M-row table.
    for w in (1, 8, 16, 32, 128):
        tbl = jnp.asarray(rng.rand(n, w).astype(np.float32))
        f = jax.jit(lambda t, i: t[i])
        timeit(f, tbl, idx_n, iters=5, name=f"row gather [{n // 1000}k,{w}] -> {d / 1e6:.1f}M rows")

    # Gather with sorted (monotone) indices — does XLA specialize?
    idx_sorted = jnp.sort(idx_n)
    tbl16 = jnp.asarray(rng.rand(n, 16).astype(np.float32))
    timeit(jax.jit(lambda t, i: t[i]), tbl16, idx_sorted, iters=5,
           name="row gather [1M,16] monotone idx")

    # Minor-dim permute of transposed layout.
    rows_t = jnp.asarray(rng.rand(16, d).astype(np.float32))
    timeit(jax.jit(lambda r, p: r[:, p]), rows_t, perm, iters=5,
           name="minor permute [16,D]")

    # take_along_axis-based variant.
    timeit(jax.jit(lambda t, i: jnp.take(t, i, axis=0, unique_indices=False,
                                         indices_are_sorted=True)), tbl16, idx_sorted,
           iters=5, name="take sorted-hint [1M,16]")


if __name__ == "__main__":
    main()
