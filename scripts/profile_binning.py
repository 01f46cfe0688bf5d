"""Micro-profile of bin_gaussians_aligned internals at the bench shape.

Isolates: tile_histogram, depth-rank, expansion map, table gather, key math, the
final sort, and the whole function — to locate the cost inside the 57ms (1M, 800^2)
binning stage.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build
from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
from relightable3dgaussians_w_tpu.ops import binning as B
from scripts.tputime import timeit


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    arrs, cam, cfg = build(n, W, H)
    means, scales, quats, opac, colors = arrs
    max_dup = cfg.max_dup
    chunk = cfg.pallas_chunk
    gx, gy = cfg.grid_x, cfg.grid_y

    pre = jax.jit(lambda m, s, q: preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        cfg.width, cfg.height, cfg.tile, cfg.scale_modifier, None, None))(
            means, scales, quats)
    jax.block_until_ready(pre)
    print(f"n={n} res={W} max_dup={max_dup}")

    timeit(jax.jit(lambda p: B.tile_histogram(p, gx, gy)), pre,
           name="tile_histogram")

    counts = pre.tiles_touched.astype(jnp.int32)
    timeit(jax.jit(lambda c: B._expand_by_counts(c, max_dup)), counts,
           name="expand_by_counts (g map)")

    def rank_of(depth):
        return jnp.zeros((n,), jnp.uint32).at[
            jnp.argsort(depth, stable=True)].set(jnp.arange(n, dtype=jnp.uint32))
    timeit(jax.jit(rank_of), pre.depth, name="depth rank (argsort+scatter)")

    g, offsets, total = jax.jit(lambda c: B._expand_by_counts(c, max_dup))(counts)
    rank = jax.jit(rank_of)(pre.depth)
    jax.block_until_ready((g, rank))

    def table_gather(p, g, rank, offsets):
        counts = p.tiles_touched.astype(jnp.int32)
        rect_w = jnp.maximum(p.rect_max[:, 0] - p.rect_min[:, 0], 1)
        table = jnp.stack([
            offsets.astype(jnp.float32), counts.astype(jnp.float32),
            p.rect_min[:, 0].astype(jnp.float32), p.rect_min[:, 1].astype(jnp.float32),
            rect_w.astype(jnp.float32), 1.0 / rect_w.astype(jnp.float32),
            rank.astype(jnp.float32), jnp.zeros((n,), jnp.float32)], axis=-1)
        return table[g]
    row, _ = timeit(jax.jit(table_gather), pre, g, rank, offsets,
                    name="table build + row gather [max_dup, 8]")

    def key_math(row, g):
        offs_g = row[:, 0].astype(jnp.int32)
        counts_g = row[:, 1].astype(jnp.int32)
        rx_g = row[:, 2].astype(jnp.int32)
        ry_g = row[:, 3].astype(jnp.int32)
        wg = row[:, 4].astype(jnp.int32)
        rank_g = row[:, 6].astype(jnp.uint32)
        slot = jnp.arange(max_dup, dtype=jnp.int32) - offs_g
        valid = (slot < counts_g)
        q = jnp.floor(slot.astype(jnp.float32) * row[:, 5]).astype(jnp.int32)
        r = slot - q * wg
        q = jnp.where(r < 0, q - 1, jnp.where(r >= wg, q + 1, q))
        r = slot - q * wg
        tile = ((ry_g + q) * gx + rx_g + r).astype(jnp.uint32)
        return jnp.where(valid, (tile << 21) | rank_g, jnp.uint32(0xFFFFFFFF))
    keys, _ = timeit(jax.jit(key_math), row, g, name="slot->tile key math")

    def sort_only(keys, g):
        sk, sg = jax.lax.sort((keys, g), num_keys=1)
        return jnp.sum(sk[::997].astype(jnp.float32)) + jnp.sum(sg[::997])
    timeit(jax.jit(sort_only), keys, g, name="final sort (u32 key + i32 payload)")

    timeit(jax.jit(lambda p: B.bin_gaussians_aligned(p, gx, gy, max_dup, chunk)),
           pre, name="bin_gaussians_aligned (whole)")


if __name__ == "__main__":
    main()
