"""k-nearest-neighbor mean squared distance for Gaussian scale initialization.

TPU-native equivalent of the reference's simple-knn CUDA extension
(`SimpleKNN::knn`, submodules/simple-knn/simple_knn.cu: Morton-code sort + box-pruned
3-NN search; used once per scene at init, gaussian_model.py:189,249). Two
implementations:

* `knn_dist2` — exact 3-NN via scipy cKDTree on the host. Initialization is a one-shot
  host-side step (the reference also runs it once), so exact + simple wins.
* `knn_dist2_jax` — on-device approximate version: Morton sort (jax.lax.sort on
  interleaved 30-bit codes) + windowed candidate search, mirroring the reference's
  box-pruning idea with a fixed window. Useful when points already live on device.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def knn_dist2(points: np.ndarray, k: int = 3, prefer_native: bool = True) -> np.ndarray:
    """Mean squared distance from each point to its k nearest neighbors (exact).

    Uses the native C++ box-pruned implementation (native/src/r3dgw_native.cpp, the
    simple-knn design) when built, else scipy's cKDTree."""
    if prefer_native and k <= 8:
        from ..native import knn_mean_dist2_native

        out = knn_mean_dist2_native(np.asarray(points), k)
        if out is not None:
            return out
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    d, _ = tree.query(points, k=k + 1)  # first neighbor is the point itself
    return (d[:, 1:] ** 2).mean(axis=1).astype(np.float32)


def _morton_codes(pts01: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10 bits per axis -> 30-bit Morton code (simple_knn.cu:45-70)."""
    q = jnp.clip((pts01 * 1023.0), 0, 1023).astype(jnp.uint32)

    def spread(x):
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def knn_dist2_jax(points: jnp.ndarray, k: int = 3, window: int = 32,
                  mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Approximate mean squared k-NN distance, fully on device and jit-able.

    Candidates are the `window` predecessors/successors in Morton order — the same
    locality structure the reference's 1024-point boxes exploit; accuracy improves
    with `window`.

    Args:
        points: [N, 3].
        mask: optional [N] bool; masked-out points are excluded as candidates and get
            dist 0.
    """
    n = points.shape[0]
    lo = jnp.min(jnp.where(mask[:, None], points, jnp.inf) if mask is not None else points, axis=0)
    hi = jnp.max(jnp.where(mask[:, None], points, -jnp.inf) if mask is not None else points, axis=0)
    pts01 = (points - lo) / jnp.maximum(hi - lo, 1e-9)
    codes = _morton_codes(pts01)
    if mask is not None:
        codes = jnp.where(mask, codes, jnp.uint32(0xFFFFFFFF))
    order = jnp.argsort(codes)
    sorted_pts = points[order]

    offs = jnp.concatenate([jnp.arange(-window, 0), jnp.arange(1, window + 1)])

    def per_point(i):
        j = jnp.clip(i + offs, 0, n - 1)
        cand = sorted_pts[j]
        d2 = jnp.sum((cand - sorted_pts[i]) ** 2, axis=-1)
        d2 = jnp.where(j == i, jnp.inf, d2)
        if mask is not None:
            d2 = jnp.where(mask[order][j], d2, jnp.inf)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top)

    d2_sorted = jax.vmap(per_point)(jnp.arange(n))
    out = jnp.zeros(n, points.dtype).at[order].set(d2_sorted)
    if mask is not None:
        out = jnp.where(mask, out, 0.0)
    return out
