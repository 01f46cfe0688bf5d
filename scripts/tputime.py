"""Pull-based timing helper: under the axon tunnel, jax.block_until_ready can return
before some Pallas-containing programs finish; forcing a 4-byte scalar reduction
transfer is reliable. Use this for ALL TPU timing in this repo."""

import time

import jax
import jax.numpy as jnp


def pull(out) -> float:
    leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
    s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
    return float(s)


def timeit(f, *args, iters: int = 10, name: str = "", quiet: bool = False):
    out = f(*args)
    pull(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    pull(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    if not quiet:
        print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return out, dt
