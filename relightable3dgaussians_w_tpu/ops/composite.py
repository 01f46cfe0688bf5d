"""Depth-ordered alpha compositing over 16x16 tiles, fully vectorized.

TPU-native re-design of the reference's per-pixel sequential compositing loops
(`renderCUDA` forward, cuda_rasterizer/forward.cu:261-374, and the back-to-front
backward with atomicAdds, backward.cu:399-557). Key transformations:

* The per-pixel front-to-back loop becomes a cumulative product over the tile's
  depth-sorted entry list: with effective alphas a_g (zeroed where the CUDA code
  `continue`s: power > 0 or alpha < 1/255), P_g = prod_{j<=g}(1 - a_j) and the CUDA
  early-termination `T*(1-alpha) < 1e-4 -> done` is exactly the prefix predicate
  P_g >= 1e-4 (P is non-increasing), so compositing weights are
  w_g = include_g * a_g * P_{g-1} and pixel color = sum_g w_g c_g + T_final * bg.
* The backward is closed-form instead of re-rasterized: with S_g = sum_{j>g} w_j
  (c_j . gbar) (a reverse suffix sum obtained from one forward cumsum),
  dL/da_g = P_{g-1} (c_g . gbar) - (S_g + T_final * B) / (1 - a_g),
  where B = bg . gbar + gbar_Tfinal folds the CUDA background term
  (backward.cu:531-534) together with cotangents on the transmittance output (the
  reference obtains alpha-image gradients by re-rasterizing with ones as colors; here
  1 - T_final IS the alpha image). Per-entry gradients are written to disjoint rows of
  the sorted entry buffer — no atomics, bitwise deterministic.
* Saturation semantics match CUDA exactly: alpha = min(0.99, op*G) saturates the
  forward but its gradient is NOT masked (backward.cu:498-499,538 uses dG = op *
  dL_dalpha unconditionally).

Entry features are pre-gathered into sorted order, so tile ranges address contiguous
rows — the same layout the Pallas kernels stream from HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
ALPHA_SAT = 0.99
T_EPS = 1e-4


# --------------------------------------------------------------- shared power math
#
# The Gaussian exponent ("power", forward.cu:336-341) is a quadratic in the pixel
# coords, so it is SEPARABLE over a tile: power(px, py) = f(px) + g(py) + qxy*px*py
# with per-entry 16-wide tables f, g and one cross term. Evaluating f/g costs
# O(tile) per entry instead of O(tile^2) per pair; the per-PAIR work drops from ~11
# VPU ops (dx/dy quadratic chain) to 2 table broadcasts + 2 adds + 1 fma — the
# single largest term in the compositor's VPU roofline (BENCH_LOG.md r2).
#
# The skip predicate power > 0 is a DISCONTINUITY of height ~opacity, so kernel and
# twin MUST compute power bit-for-bit identically: both call THESE functions with
# the same scalar op order — everything is ELEMENTWISE f32 (+ pure data movement),
# which Mosaic and XLA execute bitwise-identically. An MXU matmul form of the same
# quadratic (power = pixel-basis @ coeffs with exact Dekker-split products) was
# tried twice and is a dead end: Mosaic's and XLA's dot ACCUMULATION ORDERS differ,
# so kernel-vs-twin disagreed at ~1e-6, flipping predicates (r1c lesson at
# BENCH_LOG.md 13:1x, reconfirmed r2 on-TPU: image_max_abs 0.92 from one flipped
# high-opacity contribution). Matmuls stay out of every predicate-feeding value.


def tile_pixel_basis(tile: int):
    """[P, 6] f32 pixel basis over tile-local coords, x fastest (exact integers)."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (tile * tile, 1), 0)
    px = jnp.remainder(pix, tile).astype(jnp.float32)
    py = (pix // tile).astype(jnp.float32)
    one = jnp.ones((tile * tile, 1), jnp.float32)
    return jnp.concatenate([one, px, py, px * px, py * py, px * py], axis=1)


def entry_quad_coeffs(mxl, myl, ca, cb, cc):
    """Per-entry coefficients of power over tile-local pixel coords.

    power = -0.5*ca*(mxl-px)^2 - 0.5*cc*(myl-py)^2 - cb*(mxl-px)*(myl-py)
          = q0 + qx*px + qy*py + qxx*px^2 + qyy*py^2 + qxy*px*py.
    All element-wise — kernel ([1, CHUNK] rows) and twin ([L] vectors) get
    bitwise-identical values per element.
    """
    q0 = -0.5 * (ca * (mxl * mxl) + cc * (myl * myl)) - cb * (mxl * myl)
    qx = ca * mxl + cb * myl
    qy = cc * myl + cb * mxl
    return q0, qx, qy, -0.5 * ca, -0.5 * cc, -cb


def power_separable(q, pv, pv2, pp, tile_f, rep_g):
    """Shared arithmetic core of the separable power evaluation.

    Args:
        q: the 6 entry_quad_coeffs arrays, each broadcastable against pv.
        pv, pv2: pixel coordinate values 0..tile-1 and their squares, laid out
            along the PIXEL axis of the caller (kernel: [tile, 1] columns;
            twin: [1, tile] rows). Exact small integers.
        pp: px*py per FULL pixel (exact integers <= (tile-1)^2), caller layout.
        tile_f / rep_g: pure data-movement closures expanding the 16-wide f / g
            tables to the full P = tile^2 pixels (f indexed by px = p % tile,
            g by py = p // tile). Copies only — no arithmetic, so any lowering
            (tile/repeat/broadcast-reshape) keeps bitwise parity.

    Every arithmetic op here is elementwise f32 in a fixed order — the ONLY safe
    way to keep the Pallas kernel and the jnp twin predicate-consistent (module
    comment above)."""
    q0, qx, qy, qxx, qyy, qxy = q
    f = q0 + qx * pv + qxx * pv2
    g = qy * pv + qyy * pv2
    return (tile_f(f) + rep_g(g)) + qxy * pp


class CompositeConfig(NamedTuple):
    """Static compositing parameters (hashable; safe as a jit static arg)."""
    grid_x: int
    grid_y: int
    tile: int
    channels: int
    lmax_per_tile: int   # static cap on entries considered per tile (jnp path only)
    tile_chunk: int = 16 # tiles processed per lax.map step (memory/throughput knob)


def _tile_pixel_coords(t: jnp.ndarray, cfg: CompositeConfig):
    """Pixel-center coordinates of tile t's pixels, flattened [P=tile*tile]."""
    ty = t // cfg.grid_x
    tx = t % cfg.grid_x
    xs = tx * cfg.tile + jnp.arange(cfg.tile, dtype=jnp.float32)
    ys = ty * cfg.tile + jnp.arange(cfg.tile, dtype=jnp.float32)
    px = jnp.tile(xs, (cfg.tile,))                     # x varies fastest
    py = jnp.repeat(ys, cfg.tile)
    return px, py


def _tile_geometry(feat: jnp.ndarray, t, s, e, cfg: CompositeConfig):
    """Gather this tile's entries and compute the (L, P) alpha matrix.

    feat rows: [mx, my, conic_a, conic_b, conic_c, opacity, colors...].
    Returns (alpha_eff, aux dict with everything the fwd/bwd needs).
    """
    L = cfg.lmax_per_tile
    D = feat.shape[0]
    idx = s + jnp.arange(L, dtype=jnp.int32)
    valid = idx < e
    rows = feat[jnp.clip(idx, 0, D - 1)]               # [L, F]
    mx, my = rows[:, 0], rows[:, 1]
    ca, cb, cc = rows[:, 2], rows[:, 3], rows[:, 4]
    op = rows[:, 5]
    colors = rows[:, 6:]

    px, py = _tile_pixel_coords(t, cfg)
    dx = mx[:, None] - px[None, :]                     # [L, P] (grads only)
    dy = my[:, None] - py[None, :]
    # Power via the shared separable form (module helpers): tile-local mean,
    # identical scalar op order to the Pallas kernel so skip predicates agree
    # bitwise. Twin layout: entries on rows, pixels on columns.
    tile = cfg.tile
    tx0 = ((t % cfg.grid_x) * tile).astype(jnp.float32)
    ty0 = ((t // cfg.grid_x) * tile).astype(jnp.float32)
    q6 = entry_quad_coeffs((mx - tx0)[:, None], (my - ty0)[:, None],
                           ca[:, None], cb[:, None], cc[:, None])    # [L, 1] each
    pv = jnp.arange(tile, dtype=jnp.float32)[None, :]                # [1, tile]
    pp = ((px - tx0) * (py - ty0))[None, :]                          # [1, P] exact ints
    power = power_separable(
        q6, pv, pv * pv, pp,
        tile_f=lambda f: jnp.tile(f, (1, tile)),                     # col p -> f[p % tile]
        rep_g=lambda g: jnp.repeat(g, tile, axis=1),                 # col p -> g[p // tile]
    )                                                                # [L, P]
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_SAT, op[:, None] * G)
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN) | (~valid[:, None])
    alpha = jnp.where(skip, 0.0, alpha_raw)
    return alpha, dict(
        idx=idx, valid=valid, colors=colors, op=op, G=G, dx=dx, dy=dy, power=power, skip=skip
    )


def _forward_one_tile(feat, tile_start, tile_end, bg, t, cfg: CompositeConfig):
    s, e = tile_start[t], tile_end[t]
    alpha, aux = _tile_geometry(feat, t, s, e, cfg)
    one_m = 1.0 - alpha
    P_inc = jnp.cumprod(one_m, axis=0)                               # [L, P]
    P_prev = jnp.concatenate([jnp.ones_like(P_inc[:1]), P_inc[:-1]], axis=0)
    include = P_inc >= T_EPS
    w = jnp.where(include, alpha * P_prev, 0.0)                      # [L, P]
    color = jnp.einsum("lp,lc->pc", w, aux["colors"],
                       precision=jax.lax.Precision.HIGHEST)      # MXU matmul, f32
    T_fin = jnp.prod(jnp.where(include, one_m, 1.0), axis=0)         # [P]
    out = color + T_fin[:, None] * bg[None, :]
    return out, T_fin


def _map_tiles(fn, num_tiles: int, chunk: int, *out_shapes):
    """Apply fn over all tile ids in chunks of `chunk` (vmapped inside lax.map)."""
    padded = ((num_tiles + chunk - 1) // chunk) * chunk
    tids = jnp.arange(padded, dtype=jnp.int32).reshape(-1, chunk)
    results = jax.lax.map(jax.vmap(fn), tids)
    return jax.tree_util.tree_map(lambda r: r.reshape((padded,) + r.shape[2:])[:num_tiles], results)


def composite_forward(feat, tile_start, tile_end, bg, cfg: CompositeConfig):
    """Composite all tiles. Returns (tiles_rgb [T, P, C], tiles_Tfin [T, P])."""
    num_tiles = cfg.grid_x * cfg.grid_y

    def per_tile(t):
        # Out-of-range padding tiles render pure background (cropped by caller).
        t = jnp.minimum(t, num_tiles - 1)
        return _forward_one_tile(feat, tile_start, tile_end, bg, t, cfg)

    return _map_tiles(per_tile, num_tiles, cfg.tile_chunk)


def composite_backward(feat, tile_start, tile_end, bg, cfg: CompositeConfig,
                       g_tiles, g_tfin):
    """Analytic backward. g_tiles: [T, P, C] pixel-color cotangent; g_tfin: [T, P].

    Returns (d_feat [D, F], d_bg [C]).
    """
    num_tiles = cfg.grid_x * cfg.grid_y
    D, F = feat.shape

    def per_tile(t):
        t = jnp.minimum(t, num_tiles - 1)
        s, e = tile_start[t], tile_end[t]
        alpha, aux = _tile_geometry(feat, t, s, e, cfg)
        gbar = g_tiles[t]                                            # [P, C]
        gT = g_tfin[t]                                               # [P]
        one_m = 1.0 - alpha
        P_inc = jnp.cumprod(one_m, axis=0)
        P_prev = jnp.concatenate([jnp.ones_like(P_inc[:1]), P_inc[:-1]], axis=0)
        include = P_inc >= T_EPS
        w = jnp.where(include, alpha * P_prev, 0.0)
        T_fin = jnp.prod(jnp.where(include, one_m, 1.0), axis=0)     # [P]

        cdotg = jnp.einsum("lc,pc->lp", aux["colors"], gbar,
                           precision=jax.lax.Precision.HIGHEST)    # [L, P]
        wc = w * cdotg
        Q = jnp.cumsum(wc, axis=0)                                   # inclusive prefix
        total = Q[-1:]                                               # [1, P]
        S = total - Q                                                # suffix sum over j > g
        # Default TPU matmul precision is bf16; B feeds d_alpha -> every geometry
        # gradient, so pin f32 (the Pallas twin computes this product at HIGHEST).
        B = jnp.einsum("pc,c->p", gbar, bg,
                       precision=jax.lax.Precision.HIGHEST) + gT     # [P]

        contrib = include & (~aux["skip"])
        d_alpha = jnp.where(
            contrib,
            P_prev * cdotg - (S + (T_fin * B)[None, :]) / one_m,
            0.0,
        )
        G = aux["G"]
        op = aux["op"]
        dG = op[:, None] * d_alpha                                   # CUDA: unmasked by 0.99 sat
        d_op = jnp.sum(G * d_alpha, axis=1)                          # [L]
        d_colors = jnp.einsum("lp,pc->lc", w, gbar,
                              precision=jax.lax.Precision.HIGHEST)  # [L, C]

        dx, dy = aux["dx"], aux["dy"]
        gdx = G * dx
        gdy = G * dy
        ca = _col(feat, aux, 2)
        cb = _col(feat, aux, 3)
        cc = _col(feat, aux, 4)
        d_delx = dG * (-(gdx * ca[:, None] + gdy * cb[:, None]))
        d_dely = dG * (-(gdy * cc[:, None] + gdx * cb[:, None]))
        d_mx = jnp.sum(d_delx, axis=1)
        d_my = jnp.sum(d_dely, axis=1)
        d_ca = jnp.sum(-0.5 * gdx * dx * dG, axis=1)
        d_cb = jnp.sum(-(gdx * dy) * dG, axis=1)
        d_cc = jnp.sum(-0.5 * gdy * dy * dG, axis=1)

        d_rows = jnp.concatenate(
            [jnp.stack([d_mx, d_my, d_ca, d_cb, d_cc, d_op], axis=-1), d_colors], axis=-1
        )                                                            # [L, F]
        d_rows = jnp.where(aux["valid"][:, None], d_rows, 0.0)
        d_bg_tile = jnp.einsum("p,pc->c", T_fin, gbar,
                               precision=jax.lax.Precision.HIGHEST)  # [C]
        return d_rows, aux["idx"], aux["valid"], d_bg_tile

    d_rows, idxs, valids, d_bg_tiles = _map_tiles(per_tile, num_tiles, cfg.tile_chunk)
    d_feat = jnp.zeros((D, F), dtype=feat.dtype)
    flat_idx = jnp.where(valids, idxs, D).reshape(-1)
    d_feat = d_feat.at[flat_idx].add(d_rows.reshape(-1, F), mode="drop")
    return d_feat, jnp.sum(d_bg_tiles, axis=0)


def _col(feat, aux, j):
    """Re-gather one feature column for this tile's entries (keeps bwd readable)."""
    D = feat.shape[0]
    return feat[jnp.clip(aux["idx"], 0, D - 1), j]


# ------------------------------------------------------------------ custom_vjp wrapper


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def composite_tiles(feat, tile_start, tile_end, bg, cfg: CompositeConfig):
    """Differentiable tile compositor with the analytic deterministic backward."""
    return composite_forward(feat, tile_start, tile_end, bg, cfg)


def _composite_fwd(feat, tile_start, tile_end, bg, cfg):
    out = composite_forward(feat, tile_start, tile_end, bg, cfg)
    return out, (feat, tile_start, tile_end, bg)


def _composite_bwd(cfg, res, cots):
    feat, tile_start, tile_end, bg = res
    g_tiles, g_tfin = cots
    d_feat, d_bg = composite_backward(feat, tile_start, tile_end, bg, cfg, g_tiles, g_tfin)
    return d_feat, None, None, d_bg


composite_tiles.defvjp(_composite_fwd, _composite_bwd)


def composite_tiles_autodiff(feat, tile_start, tile_end, bg, cfg: CompositeConfig):
    """Reference twin: identical forward, gradients via plain jax autodiff. Used by the
    parity tests (the repo-wide twin-implementation discipline, SURVEY.md §4)."""
    return composite_forward(feat, tile_start, tile_end, bg, cfg)
