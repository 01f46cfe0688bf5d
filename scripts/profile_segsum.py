"""Micro-profile of the segment-sum backward (the Gaussian-gradient reduction).

Splits segment_sum_rows into its sort and kernel halves to locate the cost at the
bench shape (D ~ 4.8M entries, N = 1M segments, 9 gradient rows).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from relightable3dgaussians_w_tpu.ops.pallas.segment_sum import (
    segment_sum_rows, MACRO)
from scripts.tputime import timeit


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    d = int(os.environ.get("SEG_D", ((4_834_304 + MACRO - 1) // MACRO) * MACRO))
    f = 9
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, n, size=(d,)), jnp.int32)
    rows = [jnp.asarray(rng.normal(size=(d,)), jnp.float32) for _ in range(f)]
    print(f"D={d} N={n} F={f}")

    # Full segment-sum.
    full = jax.jit(lambda ids, *rows: segment_sum_rows(list(rows), ids, n))
    timeit(full, ids, *rows, name="segment_sum_rows (full)")

    # Sort only (key + F payloads).
    def sort_only(ids, *rows):
        out = jax.lax.sort((ids.astype(jnp.uint32),) + tuple(rows), num_keys=1)
        return [o[:8] for o in out]  # tiny outputs; sort can't be DCE'd past them? it can — sum instead
    def sort_sum(ids, *rows):
        out = jax.lax.sort((ids.astype(jnp.uint32),) + tuple(rows), num_keys=1)
        return sum(jnp.sum(o[::997].astype(jnp.float32)) for o in out)
    timeit(jax.jit(sort_sum), ids, *rows, name="sort key + 9 payloads")

    for k in (0, 1, 3, 5):
        timeit(jax.jit(sort_sum), ids, *rows[:k], name=f"sort key + {k} payloads")

    # Kernel only (pre-sorted inputs).
    ids_s = jnp.sort(ids)
    for blk in (256, 512, 1024):
        for k in (1, 9):
            ker = jax.jit(lambda ids, *rows: segment_sum_rows(
                list(rows), ids, n, block=blk, presorted=True))
            try:
                timeit(ker, ids_s, *rows[:k],
                       name=f"kernel only block={blk} F={k}")
            except Exception as e:
                print(f"kernel block={blk} F={k} failed: {type(e).__name__}")


if __name__ == "__main__":
    main()
