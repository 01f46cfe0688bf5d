"""r4 probe C: lax.sort cost vs payload width at binning shapes, on TPU.

Decides the feature-payload one-sort binning redesign: replacing
[depth sort (4.7) + 1-key big sort (8.6) + 16-col row gather (16.1)] with ONE
(tile, depth-bits) 2-key sort that carries the 9 (bench) / 19 (train) feature
columns as complex64-packed payloads. Also measures byte-plane build cost and
the post-sort unpack+stack.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    jfn = jax.jit(fn)
    out = jfn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][:1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    D = 2_457_600      # max_dup 2.1M + tile pads, MACRO-rounded
    N = 1_000_000
    key = jax.random.PRNGKey(0)
    k1 = jax.random.uniform(key, (D,), jnp.float32)
    tile = jax.random.randint(jax.random.fold_in(key, 1), (D,), 0, 2500,
                              jnp.uint32).astype(jnp.uint32)
    depth = jax.random.uniform(jax.random.fold_in(key, 2), (D,), jnp.float32,
                               0.2, 50.0)
    dbits = jax.lax.bitcast_convert_type(depth, jnp.uint32)
    gid = jax.random.randint(jax.random.fold_in(key, 3), (D,), 0, N, jnp.int32)

    def feats(n_c64):
        out = []
        for i in range(n_c64):
            a = jax.random.normal(jax.random.fold_in(key, 10 + 2 * i), (D,))
            b = jax.random.normal(jax.random.fold_in(key, 11 + 2 * i), (D,))
            out.append(jax.lax.complex(a, b))
        return tuple(out)

    # current big sort: 1 u32 key + 1 i32 payload
    t = timeit(lambda k, g: jax.lax.sort((k, g), num_keys=1), tile, gid)
    print(f"1key+i32  D={D}: {t*1e3:.2f} ms")

    # 2-key lexicographic, gid only
    t = timeit(lambda a, b, g: jax.lax.sort((a, b, g), num_keys=2), tile, dbits, gid)
    print(f"2key+i32  D={D}: {t*1e3:.2f} ms")

    for n_c64, tag in [(5, "bench F=9+gid"), (10, "train F=19+gid")]:
        f = feats(n_c64)
        t = timeit(lambda a, b, *f: jax.lax.sort((a, b) + f, num_keys=2),
                   tile, dbits, *f)
        print(f"2key+{n_c64}c64 ({tag}) D={D}: {t*1e3:.2f} ms")

    # byte-plane build: [N, F] f32 -> [4F, N] bf16
    F = 10
    fp = jax.random.normal(jax.random.fold_in(key, 99), (N, F), jnp.float32)

    def planes(fp):
        u = jax.lax.bitcast_convert_type(fp, jnp.uint32)  # [N, F]
        ps = [((u >> (8 * k)) & 0xFF).astype(jnp.bfloat16) for k in range(4)]
        return jnp.concatenate(ps, axis=1).T  # [4F, N]

    t = timeit(planes, fp)
    print(f"byte-planes [{N},{F}] -> [40,N]bf16: {t*1e3:.2f} ms")

    # post-sort unpack + stack to [F_pad, D]
    f5 = feats(5)

    def unpack(*f):
        cols = []
        for p in f:
            cols += [jnp.real(p), jnp.imag(p)]
        return jnp.stack(cols[:9] + [jnp.zeros_like(cols[0])] * 7, axis=0)

    t = timeit(unpack, *f5)
    print(f"unpack+stack 9->[16,D]: {t*1e3:.2f} ms")

    # reference: current-style row gather at this D (for the record)
    big = jax.random.normal(key, (N, 16), jnp.float32)
    t = timeit(lambda T, g: T[g].T, big, gid, iters=5)
    print(f"row gather [N,16] D rows + T: {t*1e3:.2f} ms")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
