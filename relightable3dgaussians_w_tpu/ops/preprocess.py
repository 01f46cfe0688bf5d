"""Per-Gaussian preprocessing: projection, EWA 2D covariance, conic, tile rects.

TPU-native re-design of the reference CUDA `preprocessCUDA` / `computeCov2D` /
`computeCov3D` (cuda_rasterizer/forward.cu:74-256): a fully vectorized jnp pipeline
(vmapped matrix math lowers onto the VPU/MXU) instead of one CUDA thread per Gaussian.
All culling decisions become masks; shapes stay static.

Numerics match the reference exactly: near-cull at view z <= 0.2 (auxiliary.h:139-164),
homogeneous epsilon 1e-7, the 1.3*tanfov frustum clamp before the Jacobian, the +0.3
screen-space low-pass, the max(0.1, ...) eigenvalue guard, radius = ceil(3*sigma_max),
and the BLOCK-aligned tile rectangle of getRect (auxiliary.h:46-56).

One deliberate, image-exact improvement over the reference: when `opacities` is
given, the binning rectangle is the reference's square (half-width radius = 3*sigma_max)
INTERSECTED with the per-axis box |dx| <= tau*sqrt(cov_xx), |dy| <= tau*sqrt(cov_yy)
where tau^2 = 2*ln(255*op). Every culled (Gaussian, tile) entry satisfies
alpha = min(0.99, op*exp(power)) < 1/255 at every pixel of the tile (because
min over dy of d^T Sigma^-1 d = dx^2 / cov_xx), which BOTH compositors skip — forward
(forward.cu:329-335) and backward (backward.cu:490-496) — so the rendered image,
final transmittance, and every gradient are bitwise unchanged while the entry count
(and thus sort/gather/composite cost) drops sharply for anisotropic or low-opacity
Gaussians. `radius` and the visibility filter still use the reference square so
densification bookkeeping is untouched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.graphics import covariance_3d, ndc_to_pixel


class PreprocessOut(NamedTuple):
    mean2d: jnp.ndarray        # [N, 2] pixel-space centers
    conic: jnp.ndarray         # [N, 3] inverse 2D covariance (a, b, c)
    depth: jnp.ndarray         # [N] view-space z
    radius: jnp.ndarray        # [N] int32 screen-space radius, 0 => culled
    tiles_touched: jnp.ndarray # [N] int32
    rect_min: jnp.ndarray      # [N, 2] int32 (tx, ty) inclusive
    rect_max: jnp.ndarray      # [N, 2] int32 (tx, ty) exclusive
    cov3d: jnp.ndarray         # [N, 6] world covariance (xx, xy, xz, yy, yz, zz)


def compute_cov2d(p_orig: jnp.ndarray, cov3d: jnp.ndarray, viewmat: jnp.ndarray,
                  focal_x, focal_y, tan_fovx, tan_fovy) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space (forward.cu:74-113).

    Args:
        p_orig: [N, 3] world positions.
        cov3d: [N, 6] symmetric covariance packing.
        viewmat: [4, 4] world->view.
    Returns:
        [N, 3] 2D covariance (cxx, cxy, cyy) with the +0.3 low-pass applied.
    """
    # K=3 matmuls run at bf16 by default on TPU (~2^-8 rel on projected
    # positions); pin f32 — negligible cost, positions are correctness-critical.
    HI = jax.lax.Precision.HIGHEST
    t = jnp.matmul(p_orig, viewmat[:3, :3].T, precision=HI) + viewmat[:3, 3]
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    # Near-culled rows (z <= 0.2, auxiliary.h:154) never reach compositing, but their
    # values must stay finite: a 0/0 here would poison gradients via 0 * NaN.
    tz = jnp.where(t[:, 2] > 0.2, t[:, 2], 1.0)
    txtz = t[:, 0] / tz
    tytz = t[:, 1] / tz
    tx = jnp.clip(txtz, -limx, limx) * tz
    ty = jnp.clip(tytz, -limy, limy) * tz

    # J is the 2x3 Jacobian of the perspective projection at the (clamped) view point.
    j00 = focal_x / tz
    j02 = -(focal_x * tx) / (tz * tz)
    j11 = focal_y / tz
    j12 = -(focal_y * ty) / (tz * tz)

    W = viewmat[:3, :3]  # [3, 3]
    # M = J @ W as two row vectors, fully scalar (no [N, 3, 3] temporaries — batched
    # tiny matmuls lower poorly on the VPU).
    m00 = j00 * W[0, 0] + j02 * W[2, 0]
    m01 = j00 * W[0, 1] + j02 * W[2, 1]
    m02 = j00 * W[0, 2] + j02 * W[2, 2]
    m10 = j11 * W[1, 0] + j12 * W[2, 0]
    m11 = j11 * W[1, 1] + j12 * W[2, 1]
    m12 = j11 * W[1, 2] + j12 * W[2, 2]

    a, b, c, d, e, f = (cov3d[:, i] for i in range(6))  # xx xy xz yy yz zz
    # cov2d = M V M^T expanded over the symmetric V.
    v0x = a * m00 + b * m01 + c * m02
    v1x = b * m00 + d * m01 + e * m02
    v2x = c * m00 + e * m01 + f * m02
    v0y = a * m10 + b * m11 + c * m12
    v1y = b * m10 + d * m11 + e * m12
    v2y = c * m10 + e * m11 + f * m12
    cxx = m00 * v0x + m01 * v1x + m02 * v2x + 0.3
    cxy = m10 * v0x + m11 * v1x + m12 * v2x
    cyy = m10 * v0y + m11 * v1y + m12 * v2y + 0.3
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def sym6_to_mat(c6: jnp.ndarray) -> jnp.ndarray:
    """(xx, xy, xz, yy, yz, zz) -> [..., 3, 3] symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (c6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def preprocess(means3d: jnp.ndarray, scales: jnp.ndarray, quats: jnp.ndarray,
               viewmat: jnp.ndarray, projmat: jnp.ndarray,
               tan_fovx, tan_fovy, width: int, height: int, tile: int,
               scale_modifier: float = 1.0,
               cov3d_precomp: jnp.ndarray | None = None,
               active: jnp.ndarray | None = None,
               opacities: jnp.ndarray | None = None,
               skip_alpha: float = 1.0 / 255.0) -> PreprocessOut:
    """Vectorized equivalent of preprocessCUDA (forward.cu:156-256).

    Args:
        means3d: [N, 3] world positions.
        scales: [N, 3] activated (positive) scales.
        quats: [N, 4] normalized quaternions (w, x, y, z).
        viewmat: [4, 4] world->view (math convention).
        projmat: [4, 4] full projection = P @ V.
        cov3d_precomp: optional [N, 6] precomputed world covariance.
        active: optional [N] bool — rows with False are culled outright (used for the
            fixed-capacity Gaussian pool's alive mask).
        opacities: optional [N] activated opacities in (0, 1); enables the exact
            opacity-aware rect tightening (module docstring). Rendering output is
            identical with or without it; only the entry count changes.
        skip_alpha: rect-tightening alpha threshold. 1/255 (default) matches the
            compositors' skip EXACTLY — rendering is bitwise-unchanged. Larger
            values are a SERVING LOD knob: tiles whose peak in-tile alpha is
            below skip_alpha are dropped, each dropped entry contributing less
            than skip_alpha to any pixel (bounded approximation, fewer entries
            through sort/gather — see RasterizerConfig.skip_alpha).
    """
    focal_x = width / (2.0 * tan_fovx)
    focal_y = height / (2.0 * tan_fovy)
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile

    HI = jax.lax.Precision.HIGHEST
    p_view_z = jnp.matmul(means3d, viewmat[2, :3], precision=HI) + viewmat[2, 3]
    in_front = p_view_z > 0.2

    p_hom = jnp.matmul(means3d, projmat[:3, :3].T, precision=HI) + projmat[:3, 3]
    p_w = jnp.matmul(means3d, projmat[3, :3], precision=HI) + projmat[3, 3]
    inv_w = jnp.where(in_front, 1.0 / (p_w + 1e-7), 0.0)
    ndc_xy = p_hom[:, :2] * inv_w[:, None]
    mean2d = jnp.stack(
        [ndc_to_pixel(ndc_xy[:, 0], width), ndc_to_pixel(ndc_xy[:, 1], height)], axis=-1
    )

    cov3d = covariance_3d(scales, quats, scale_modifier) if cov3d_precomp is None else cov3d_precomp
    cov = compute_cov2d(means3d, cov3d, viewmat, focal_x, focal_y, tan_fovx, tan_fovy)
    cxx, cxy, cyy = cov[:, 0], cov[:, 1], cov[:, 2]
    det = cxx * cyy - cxy * cxy
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    mid = 0.5 * (cxx + cyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    # max(..., 0): culled rows can carry garbage covariances; keep radius finite.
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(jnp.maximum(lambda1, mid - disc), 0.0)))

    # Reference tile rectangle (auxiliary.h:46-56), exclusive max, clamped to the
    # grid. `alive`/`radius` (the visibility filter) ALWAYS use this square.
    def rect(bx, by):
        x0 = jnp.clip(jnp.floor((mean2d[:, 0] - bx) / tile), 0, grid_x).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((mean2d[:, 1] - by) / tile), 0, grid_y).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((mean2d[:, 0] + bx + tile - 1) / tile), 0, grid_x).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((mean2d[:, 1] + by + tile - 1) / tile), 0, grid_y).astype(jnp.int32)
        return x0, y0, x1, y1

    rx_min, ry_min, rx_max, ry_max = rect(radius_f, radius_f)
    area = (rx_max - rx_min) * (ry_max - ry_min)

    alive = in_front & det_ok & (area > 0)
    if active is not None:
        alive = alive & active
    radius = jnp.where(alive, radius_f, 0.0).astype(jnp.int32)

    if opacities is not None:
        # Exact opacity-aware tightening (module docstring): every tile removed here
        # has alpha < 1/255 at all of its (integer-coordinate) pixels, which both
        # compositors skip. Pixels px with |mx - px| <= bx live in tiles
        # [floor((mx-bx)/tile), floor((mx+bx)/tile)] — an EXACT coverage formula
        # (the reference's `(p + r + tile - 1) / tile` can truncate the last covered
        # pixel, so it is not reused here); the result is then intersected with the
        # reference square so no tile the reference excludes is ever added. The
        # 1.0001 factor + 0.5 px absorb f32 rounding in the compositor's power chain
        # (the analytic margin at the tile boundary is ~1e-3 in power units, ~1e4 x
        # any accumulated ulp error); op < 1/255 can never contribute anywhere.
        # The culling chain is derivative-dead (every consumer passes through
        # floor/int), but severing the autodiff connection explicitly matters: with
        # opacity = sigmoid(param) feeding this chain, XLA compiles the composed
        # backward ~35-65% slower (measured 87 -> 155 ms at 500k/800^2 on v5e;
        # scripts/profile_seams.py) — the dead jvp/transpose chains through
        # tau/bx/by change fusion decisions. stop_gradient restores the fast
        # compile with bitwise-identical culling and zero gradient change.
        op = opacities[:, 0] if opacities.ndim == 2 else opacities
        op = jax.lax.stop_gradient(op)
        # Multiply by the reciprocal (not divide): 1/(1/255) rounds to exactly
        # 255.0 in f32, keeping the default bitwise-identical to the original
        # 255*op form (rect margins absorb ulps anyway, but exactness is free).
        tau = jnp.sqrt(jnp.maximum(
            2.0 * jnp.log((1.0 / skip_alpha) * jnp.maximum(op, 1e-12)), 0.0))
        bx = tau * jnp.sqrt(jnp.maximum(cxx, 0.0)) * 1.0001 + 0.5
        by = tau * jnp.sqrt(jnp.maximum(cyy, 0.0)) * 1.0001 + 0.5
        tx0 = jnp.clip(jnp.floor((mean2d[:, 0] - bx) / tile), 0, grid_x).astype(jnp.int32)
        ty0 = jnp.clip(jnp.floor((mean2d[:, 1] - by) / tile), 0, grid_y).astype(jnp.int32)
        tx1 = jnp.clip(jnp.floor((mean2d[:, 0] + bx) / tile) + 1, 0, grid_x).astype(jnp.int32)
        ty1 = jnp.clip(jnp.floor((mean2d[:, 1] + by) / tile) + 1, 0, grid_y).astype(jnp.int32)
        rx_min = jnp.maximum(rx_min, tx0)
        ry_min = jnp.maximum(ry_min, ty0)
        rx_max = jnp.minimum(rx_max, tx1)
        ry_max = jnp.minimum(ry_max, ty1)
        area_t = (jnp.maximum(rx_max - rx_min, 0) * jnp.maximum(ry_max - ry_min, 0))
        contributes = alive & (op >= skip_alpha)
        tiles_touched = jnp.where(contributes, area_t, 0).astype(jnp.int32)
        # Keep rect fields consistent with tiles_touched for the rect walk.
        rx_min = jnp.minimum(rx_min, rx_max)
        ry_min = jnp.minimum(ry_min, ry_max)
    else:
        tiles_touched = jnp.where(alive, area, 0).astype(jnp.int32)

    return PreprocessOut(
        mean2d=mean2d,
        conic=conic,
        depth=p_view_z,
        radius=radius,
        tiles_touched=tiles_touched,
        rect_min=jnp.stack([rx_min, ry_min], axis=-1),
        rect_max=jnp.stack([rx_max, ry_max], axis=-1),
        cov3d=cov3d,
    )


H_CAP = 8          # tile rows with exact per-row intervals; deeper rows fall
                   # back to the full rect width (rare at 16px tiles)
INTERVAL_MARGIN = 1.0  # px of conservative slack on each interval end


def row_intervals(pre: PreprocessOut, opacities: jnp.ndarray, tile: int = 16,
                  skip_alpha: float = 1.0 / 255.0):
    """Exact per-tile-row x-intervals of each Gaussian's contributing region.

    The region where alpha = op * exp(power) can reach 1/255 is the ellipse
    d^T conic d <= rho^2 with rho^2 = 2 ln(255 op); outside it BOTH compositors
    skip the entry with exactly-zero gradients (forward.cu:329-335,
    backward.cu:490-496), so dropping those (Gaussian, tile) pairs is
    image- and gradient-bitwise-free. Cut by a horizontal tile-row band the
    region is a contiguous x-interval; this returns, for the first H_CAP rows
    of each rect, that interval as packed txl_rel | (w << 7) (both < 128,
    exact in f32), plus the resulting exact entry count.

    Conservative by construction: continuous-coordinate extent (>= the pixel-
    center extent), INTERVAL_MARGIN px of slack each side, clamped to the
    opacity-tightened rect. Rows past H_CAP keep the full rect width.

    Returns:
        counts: [N] int32 exact per-Gaussian entry count (0 where
            tiles_touched == 0).
        packed: [H_CAP, N] f32 integers txl_rel + 128 * w_j.
    """
    op = opacities[:, 0] if opacities.ndim == 2 else opacities
    op = jax.lax.stop_gradient(op)
    m = jax.lax.stop_gradient(pre.mean2d)
    conic = jax.lax.stop_gradient(pre.conic)
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    mx, my = m[:, 0], m[:, 1]
    x0 = pre.rect_min[:, 0]
    y0 = pre.rect_min[:, 1]
    x1 = pre.rect_max[:, 0]
    y1 = pre.rect_max[:, 1]
    h = y1 - y0
    w_full = jnp.maximum(x1 - x0, 0)

    # skip_alpha = 1/255 (default) is the compositors' exact skip threshold;
    # larger values are the serving LOD knob (see preprocess docstring).
    # Reciprocal-multiply keeps the default bitwise equal to the 255*op form.
    rho2 = jnp.maximum(
        2.0 * jnp.log((1.0 / skip_alpha) * jnp.maximum(op, 1e-12)), 0.0)
    det_c = jnp.maximum(a * c - b * b, 1e-30)
    a_s = jnp.maximum(a, 1e-30)
    dx_max = jnp.sqrt(jnp.maximum(rho2 * c / det_c, 0.0))
    dy_at_xmax = -(b / jnp.maximum(c, 1e-30)) * dx_max
    dy_max = jnp.sqrt(jnp.maximum(rho2 * a / det_c, 0.0))

    counts = jnp.zeros_like(w_full)
    packed_rows = []
    for j in range(H_CAP):
        ty = y0 + j
        live = j < h
        dy0 = ty.astype(jnp.float32) * tile - my
        dy1 = dy0 + (tile - 1)
        lo = jnp.maximum(dy0, -dy_max)
        hi = jnp.minimum(dy1, dy_max)
        nonempty = lo <= hi
        # x+ is concave in dy (upper ellipse boundary): band max at the clamped
        # argmax; x- is convex: band min at the clamped argmin (-dy_at_xmax).
        dyp = jnp.clip(dy_at_xmax, lo, hi)
        sp = jnp.maximum(a_s * rho2 - det_c * dyp * dyp, 0.0)
        x_hi = mx + (-b * dyp + jnp.sqrt(sp)) / a_s + INTERVAL_MARGIN
        dym = jnp.clip(-dy_at_xmax, lo, hi)
        sm = jnp.maximum(a_s * rho2 - det_c * dym * dym, 0.0)
        x_lo = mx + (-b * dym - jnp.sqrt(sm)) / a_s - INTERVAL_MARGIN
        txl = jnp.maximum(jnp.floor(x_lo / tile).astype(jnp.int32), x0)
        txh = jnp.minimum(jnp.floor(x_hi / tile).astype(jnp.int32) + 1, x1)
        wj = jnp.clip(txh - txl, 0, w_full)
        wj = jnp.where(live & nonempty, wj, 0)
        txl_rel = jnp.clip(txl - x0, 0, 127)
        counts = counts + wj
        packed_rows.append(
            jnp.where(wj > 0, txl_rel + 128 * wj, 0).astype(jnp.float32))
    counts = counts + jnp.maximum(h - H_CAP, 0) * w_full
    counts = jnp.where(pre.tiles_touched > 0, counts, 0).astype(jnp.int32)
    return counts, jnp.stack(packed_rows, axis=0)
