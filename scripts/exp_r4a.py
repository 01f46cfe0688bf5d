"""r4 probe A: how much of D (tile entries) would exact per-tile-row ellipse
intervals remove, vs the current per-axis opacity-tightened rects?

For each Gaussian the contributing region is the ellipse
    a dx^2 + 2 b dx dy + c dy^2 <= rho^2,  rho^2 = 2 ln(255 op)
(conic = (a, b, c); outside it alpha < 1/255 and both compositors skip the
entry with exactly-zero gradients, forward.cu:329-335 / backward.cu:490-496).
The current rect is the bounding box; the exact set is, per tile ROW, a
contiguous x-interval (the ellipse cut by a horizontal band). This probe counts
both on the bench scene at several scales/anisotropies. Counts only — no timing.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def exact_row_counts(pre, tile, grid_x):
    """Per-Gaussian entry count with per-tile-row ellipse x-intervals.

    Conservative: continuous-coordinate ellipse extent per band, so every
    dropped tile has power < tau at all its pixels."""
    a, b, c = pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2]
    mx, my = pre.mean2d[:, 0], pre.mean2d[:, 1]
    x0, y0 = pre.rect_min[:, 0], pre.rect_min[:, 1]
    x1, y1 = pre.rect_max[:, 0], pre.rect_max[:, 1]
    h = y1 - y0
    w = x1 - x0
    h_max = int(jnp.max(h))

    # rho^2 from the same opacity-aware tau the preprocess tightening uses.
    rho2 = pre._rho2

    det_c = jnp.maximum(a * c - b * b, 1e-30)   # conic is PD for live rows
    a_s = jnp.maximum(a, 1e-30)
    # Global x extent (matches the per-axis box): dx_max = rho*sqrt(c/det_c)
    dx_max = jnp.sqrt(jnp.maximum(rho2 * c / det_c, 0.0))
    dy_at_xmax = -(b / jnp.maximum(c, 1e-30)) * dx_max
    dy_max = jnp.sqrt(jnp.maximum(rho2 * a / det_c, 0.0))

    counts = jnp.zeros(a.shape[0], jnp.int32)
    MARGIN = 1.0  # px, absorbs f32 rounding + pixel-center-vs-continuous

    for j in range(h_max):
        ty = y0 + j
        live = j < h
        dy0 = ty.astype(jnp.float32) * tile - my
        dy1 = dy0 + (tile - 1)
        lo = jnp.maximum(dy0, -dy_max)
        hi = jnp.minimum(dy1, dy_max)
        nonempty = lo <= hi
        # x+ is concave in dy: max over band at clamp of its argmax.
        dyp = jnp.clip(dy_at_xmax, lo, hi)
        sp = jnp.maximum(a_s * rho2 - det_c * dyp * dyp, 0.0)
        x_hi = mx + (-b * dyp + jnp.sqrt(sp)) / a_s + MARGIN
        # x- is convex: min at clamp of -dy_at_xmax
        dym = jnp.clip(-dy_at_xmax, lo, hi)
        sm = jnp.maximum(a_s * rho2 - det_c * dym * dym, 0.0)
        x_lo = mx + (-b * dym - jnp.sqrt(sm)) / a_s - MARGIN
        tx_lo = jnp.maximum(jnp.floor(x_lo / tile).astype(jnp.int32), x0)
        tx_hi = jnp.minimum(jnp.floor(x_hi / tile).astype(jnp.int32) + 1, x1)
        wrow = jnp.clip(tx_hi - tx_lo, 0, w)
        wrow = jnp.where(live & nonempty, wrow, 0)
        counts = counts + wrow
    return counts


def run(n, W, H, aniso=None, seed=0):
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from bench import build

    arrs, cam, cfg = build(n, W, H, seed=seed)
    means, scales, quats, opac, colors = [np.asarray(x) for x in arrs]
    if aniso is not None:
        # Stretch one axis to emulate trained anisotropic splats.
        scales = scales.copy()
        scales[:, 0] *= aniso
    pre = preprocess(
        jnp.asarray(means), jnp.asarray(scales), jnp.asarray(quats),
        cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        W, H, 16, opacities=jnp.asarray(opac))
    op = jnp.asarray(opac)
    rho2 = jnp.maximum(2.0 * jnp.log(255.0 * jnp.maximum(op, 1e-12)), 0.0)
    pre_d = pre._asdict()
    pre_d["_rho2"] = rho2

    class P:  # tiny shim to carry rho2 alongside
        pass
    p = P()
    for k, v in pre_d.items():
        setattr(p, k, v)

    d_rect = int(jnp.sum(pre.tiles_touched))
    exact = exact_row_counts(p, 16, cfg.grid_x)
    exact = jnp.minimum(exact, pre.tiles_touched)  # interval never exceeds rect row
    d_exact = int(jnp.sum(jnp.where(pre.tiles_touched > 0, exact, 0)))
    tag = f"aniso={aniso}" if aniso else "bench"
    print(f"{tag}: n={n} {W}x{H}  D_rect={d_rect}  D_exact={d_exact}  "
          f"ratio={d_exact / max(d_rect,1):.3f}")
    # distribution of rect sizes
    tt = np.asarray(pre.tiles_touched)
    live = tt[tt > 0]
    print(f"  tiles/gauss: mean={live.mean():.2f} p50={np.percentile(live,50):.0f} "
          f"p90={np.percentile(live,90):.0f} p99={np.percentile(live,99):.0f} "
          f"max={live.max()}")


if __name__ == "__main__":
    run(1_000_000, 800, 800)
    run(1_000_000, 800, 800, aniso=8.0)
    run(500_000, 800, 800)
