"""r4 squeeze batch: segsum Dekker passes, composite tiles_per_step/chunk.

One TPU process (remote compiles batch here). Measures the full split-dispatch
bench step (the headline config: 1M / 800^2) under:
  A. SEGSUM_PASSES=3 (baseline) vs 2 — 1/3 fewer MXU rows in the gradient
     segment-sum; also reports the max rel grad difference 2 vs 3 passes.
  B. tiles_per_step 4 (baseline) vs 8 at chunk 512.
  C. pallas_chunk 384 vs 512.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import build
from relightable3dgaussians_w_tpu.ops.rasterize import make_rasterize_grad_split


def time_step(step, arrs, bg, iters=8):
    g = step(*arrs, bg)
    s = float(sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(g[1])))
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*arrs, bg)
    float(jnp.sum(g[1][0]))
    return (time.perf_counter() - t0) / iters * 1e3, g


def main():
    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = 800
    arrs, cam, cfg = build(n, W, H)
    bg = jnp.zeros(3, jnp.float32)

    def img_loss(img, aux):
        return jnp.sum(img) + jnp.sum(aux.alpha)

    def make(cfg2):
        return make_rasterize_grad_split(cam, cfg2, img_loss)

    results = {}
    grads = {}
    for tag, env_passes, cfg2 in [
        ("base p3 tb4 c512", "3", cfg),
        ("p2 tb4 c512", "2", cfg),
        ("p3 tb8 c512", "3", cfg._replace(tiles_per_step=8)),
        ("p3 tb4 c384", "3", cfg._replace(pallas_chunk=384, align_chunk=128)),
    ]:
        os.environ["SEGSUM_PASSES"] = env_passes
        step = make(cfg2)
        ms, g = time_step(step, arrs, bg)
        results[tag] = ms
        grads[tag] = jax.tree_util.tree_map(np.asarray, g[1])
        print(f"{tag:24s} {ms:7.2f} ms/iter  ({W*H/ms*1e3/1e6:.2f} Mpix/s)")

    a, b = grads["base p3 tb4 c512"], grads["p2 tb4 c512"]
    for i, name in enumerate(["d_means", "d_scales", "d_quats", "d_opac", "d_colors"]):
        d = np.abs(a[i] - b[i]).max()
        s = np.abs(a[i]).max() + 1e-12
        print(f"passes 2 vs 3 {name}: max|d|={d:.3e} rel={d/s:.3e}")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    main()
