"""Pallas TPU kernels for depth-ordered tile compositing (forward + backward).

The TPU-native replacement for the reference's `renderCUDA` forward/backward
(cuda_rasterizer/forward.cu:261-374, backward.cu:399-557). Design (SURVEY.md §7):

* grid = one program per 16x16 tile. The tile's depth-sorted entries live in HBM in a
  TRANSPOSED layout feat_T [F, D_aligned] whose per-tile segments start at
  chunk-aligned offsets (see ops/binning.py align_entries) so each DMA slice
  [:, start + c*chunk : +chunk] is lane-aligned (TPU DMA requires 128-aligned minor
  slices). Chunks stream through a double-buffered VMEM scratch.
* the per-pixel sequential loop becomes, per chunk, a (P x CHUNK) alpha matrix on the
  VPU (pixels on sublanes, entries on lanes) and a cumulative product computed in log
  space via an upper-triangular MATMUL on the MXU (row cumsum = X @ U); the
  early-termination predicate P >= 1e-4 is carried across chunks as the raw
  transmittance product and the chunk loop stops early once every pixel terminated.
* color accumulation and all backward reductions are MXU matmuls, so fusing many AOV
  channels is nearly free.
* the backward reruns the same forward-ordered recurrence (no back-to-front
  re-rasterization): suffix sums come from one prefix cumsum plus the per-pixel total
  reconstructed from the forward outputs; per-entry gradients are DMA'd to disjoint
  slices of the output buffer — no atomics, bitwise deterministic.

Numerics match the CUDA semantics: alpha = min(0.99, op * exp(power)), power > 0 and
alpha < 1/255 skips, termination when T*(1-alpha) < 1e-4, and the backward's unmasked
saturation gradient (backward.cu:498-499,538).

Feature row layout (leading F dim): 0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c,
5 opacity, 6.. colors; F is padded to a multiple of 8 with zero rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..composite import (ALPHA_MIN, ALPHA_SAT, T_EPS, tile_pixel_basis,
                         entry_quad_coeffs, power_separable)

NEG_LOG_EPS = -50.0  # exp(-50) ~ 2e-22: "zero" transmittance in log space

# SERVING packed-RGB quantization (RasterizerConfig.packed_rgb): R and B ride ONE
# f32 feature row as 12-bit fixed point (q_r*4096 + q_b <= 2^24 - 1, exact in f32),
# G stays exact f32 — the 9-row RGB feature pack drops from a 16-row padded gather
# to 8 rows, halving the serving path's dominant gather bytes. Max abs error per
# packed channel = PACK_LIM / PACK_LEVELS / 2 ~ 9.8e-4 (~1/4 of a uint8 display
# step); entries are clamped to [0, PACK_LIM) before packing. Fwd-only (no VJP).
PACK_LIM = 8.0
PACK_LEVELS = 4095.0


def pack_rb(colors):
    """[N, 3] float rgb -> ([N] packed_rb, [N] g). Exact-f32 integer packing."""
    q = jnp.round(jnp.clip(colors[:, ::2], 0.0, PACK_LIM) * (PACK_LEVELS / PACK_LIM))
    return q[:, 0] * 4096.0 + q[:, 1], colors[:, 1]


def _unpack_rb_rows(row_rb, row_g):
    """Kernel-side inverse of pack_rb: [1, CHUNK] rows -> [3, CHUNK] rgb.

    floor(x * 2^-12) and the remainder are exact in f32 for the packed integers,
    so kernel colors equal the host dequantization bitwise."""
    q_r = jnp.floor(row_rb * (1.0 / 4096.0))
    q_b = row_rb - q_r * 4096.0
    step = PACK_LIM / PACK_LEVELS
    return jnp.concatenate([q_r * step, row_g, q_b * step], axis=0)


def _chunk_alpha(rows, valid_len, tile, px0, py0, chunk):
    """rows: [F, CHUNK]; returns alpha [P, CHUNK] and aux terms.

    power uses the shared SEPARABLE form (composite.py power_separable): 16-wide
    per-entry f/g tables + one cross fma instead of the ~11-op dx/dy chain per
    pixel-entry pair. The skip predicate power > 0 (forward.cu:343) is a
    discontinuity of height ~opacity, so kernel and twin MUST agree bitwise —
    both call the SAME elementwise helpers in the same order (MXU forms are
    banned from predicate-feeding values: Mosaic/XLA dot accumulation orders
    differ, see composite.py module comment)."""
    mxl = rows[0:1, :] - px0
    myl = rows[1:2, :] - py0
    ca = rows[2:3, :]
    cb = rows[3:4, :]
    cc = rows[4:5, :]
    op = rows[5:6, :]
    q6 = entry_quad_coeffs(mxl, myl, ca, cb, cc)        # [1, CHUNK] each
    P = tile * tile
    pv = jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    pp = (jnp.remainder(pix, tile) * (pix // tile)).astype(jnp.float32)
    power = power_separable(
        q6, pv, pv * pv, pp,
        # row p -> f[p % tile] (px fastest): stack tile copies along sublanes.
        tile_f=lambda f: jnp.tile(f, (tile, 1)),
        # row p -> g[p // tile]: broadcast each row tile times, then flatten.
        rep_g=lambda g: jnp.broadcast_to(g[:, None, :], (tile, tile, chunk))
                           .reshape(P, chunk),
    )                                                    # [P, CHUNK]
    G = jnp.exp(jnp.minimum(power, 0.0))
    alpha_raw = jnp.minimum(ALPHA_SAT, op * G)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    invalid = lane >= valid_len
    skip = (power > 0.0) | (alpha_raw < ALPHA_MIN) | invalid
    alpha = jnp.where(skip, 0.0, alpha_raw)
    return alpha, dict(G=G, skip=skip, op=op, ca=ca, cb=cb, cc=cc)


def _triu(chunk, strict):
    r = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return jnp.where(r < c if strict else r <= c, 1.0, 0.0)


def _contract_lanes(a, b):
    """a: [P, K], b: [C, K] -> [P, C] contracting the lane dim.

    NOT a live kernel path: this is the HIGHEST-precision reference twin kept
    as the oracle for the accuracy pin (tests/test_kernel_contractions.py) —
    the kernels contract via _contract_lanes2 (2-term Dekker, ~3x cheaper on
    the MXU). Do not delete without moving the pin's oracle."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def _dekker2(x, axis=0):
    """One-sided 2-term Dekker split: x = hi + mid (each bf16) to ~2^-16 rel,
    stacked along `axis` for a single MXU call."""
    hi = x.astype(jnp.bfloat16)
    mid = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([hi, mid], axis=axis)


def _contract_lanes2(a, b):
    """a: [P, K], b: [C, K] -> [P, C] contracting lanes via 2x2 Dekker-split bf16
    blocks, dropping the mid x mid term (~2^-17 rel — gradient/color-accumulation
    accuracy, NOT for predicate-feeding values). One MXU call whose [2P, 2C]
    output rides the same 128-lane column padding as [P, C], so it costs ~2
    effective passes where precision=HIGHEST costs 6 — exp_r4g measured the
    HIGHEST color contraction alone at 3.6 ms of the 14.9 ms forward."""
    p, c = a.shape[0], b.shape[0]
    o = jax.lax.dot_general(_dekker2(a), _dekker2(b), (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o[:p, :c] + o[:p, c:] + o[p:, :c]


def _dot_exact_rhs(x, U):
    """x @ U where U is EXACTLY representable in bf16 (the 0/1 triangular masks):
    one-sided Dekker split of x into hi/mid bf16 terms — every product on the MXU is
    exact, so the result carries ~16 mantissa bits (rel ~2^-16) at 2 MXU passes
    instead of precision=HIGHEST's 6 (same trick as ops/pallas/segment_sum.py, which
    keeps 3 terms). These triangular prefix matmuls are the kernel's dominant MXU
    cost. 2 passes suffice HERE because both prefix consumers tolerate ~1e-4
    absolute fuzz: exp(excl) only matters while excl >= log(1e-4) (|excl| <= 9.2, so
    abs err <= 9.2*2^-16 ~ 1.4e-4 -> w rel err ~1e-4), and a flip of the
    include/termination predicate at the T ~ 1e-4 boundary changes a contribution
    bounded by alpha*1e-4 — unlike the power > 0 predicate (see _chunk_alpha), this
    discontinuity's height is the threshold itself."""
    hi = x.astype(jnp.bfloat16)
    mid = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    p = x.shape[0]
    out = jax.lax.dot(jnp.concatenate([hi, mid], axis=0), U.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    return out[:p] + out[p:]


def _prefix_exact(x, strict):
    """Row prefix-sum along lanes of x [P, chunk] (strict-exclusive or inclusive) as
    128-wide triangular Dekker matmuls + f32 block-carry adds: an n-block chunk costs
    n [3P,128]x[128,128] passes instead of one [3P,chunk]x[chunk,chunk] — 1/n of the
    MXU FLOPs (128 is the floor: smaller contraction dims pad to the MXU tile). At
    least as accurate as the one-shot form (each block sums 128 terms instead of
    `chunk` in the f32 accumulator; carries are plain f32 adds)."""
    chunk = x.shape[1]
    if chunk <= 128 or chunk % 128 != 0:
        return _dot_exact_rhs(x, _triu(chunk, strict))
    U = _triu(128, strict)
    outs = []
    carry = None
    for i in range(chunk // 128):
        xb = x[:, i * 128 : (i + 1) * 128]
        eb = _dot_exact_rhs(xb, U)
        outs.append(eb if carry is None else eb + carry)
        tot = eb[:, 127:128] + xb[:, 127:128] if strict else eb[:, 127:128]
        carry = tot if carry is None else carry + tot
    return jnp.concatenate(outs, axis=1)


# ------------------------------------------------------------------------- forward


def _fwd_kernel(starts_ref, counts_ref, feat_hbm, out_ref, tfin_ref,
                scratch, sems, *, tile, chunk, channels, f_pad, grid_x,
                align, tb, packed_rgb=False):
    P = tile * tile

    # tb tiles per grid step: the per-step machinery (block write pipeline, loop
    # setup) measured ~2.2 us/tile on v5e (exp_r3d ZERO-counts probe, ~5.5 ms of
    # the forward at 2500 tiles); batching amortizes it 1/tb.
    for j in range(tb):
        t = pl.program_id(0) * tb + j
        tx = t % grid_x
        ty = t // grid_x
        start = starts_ref[t]
        count = counts_ref[t]
        n_chunks = pl.cdiv(count, chunk)
        px0 = (tx * tile).astype(jnp.float32)
        py0 = (ty * tile).astype(jnp.float32)

        def get_dma(slot, c_idx, start=start):
            return pltpu.make_async_copy(
                feat_hbm.at[:, pl.ds(pl.multiple_of(start + c_idx * chunk, align), chunk)],
                scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            get_dma(0, 0).start()

        def body(carry, count=count, n_chunks=n_chunks, px0=px0, py0=py0,
                 get_dma=get_dma):
            c_idx, _, log_praw, acc, log_tfin = carry
            slot = jnp.remainder(c_idx, 2)

            get_dma(slot, c_idx).wait()
            rows = scratch[slot]
            valid_len = count - c_idx * chunk
            alpha, _ = _chunk_alpha(rows, valid_len, tile, px0, py0, chunk)
            log1m = jnp.log(1.0 - alpha)
            log_praw_new = jnp.maximum(log_praw + jnp.sum(log1m, axis=1, keepdims=True),
                                       NEG_LOG_EPS)

            # Prefetch the next chunk only if the loop will actually continue —
            # exiting with an un-awaited DMA in flight is undefined behavior. Deciding
            # after the (cheap) alpha pass still overlaps the DMA with the matmuls.
            cont = (c_idx + 1 < n_chunks) & (jnp.max(log_praw_new) >= jnp.log(T_EPS))

            @pl.when(cont)
            def _():
                get_dma(jnp.remainder(c_idx + 1, 2), c_idx + 1).start()

            excl = _prefix_exact(log1m, True) + log_praw
            log_p_inc = excl + log1m
            include = log_p_inc >= jnp.log(T_EPS)
            w = jnp.where(include, alpha * jnp.exp(excl), 0.0)      # [P, CHUNK]

            if packed_rgb:
                colors = _unpack_rb_rows(rows[6:7, :], rows[7:8, :])  # [3, CHUNK]
            else:
                colors = rows[6 : 6 + channels, :]                   # [C, CHUNK]
            acc = acc + _contract_lanes2(w, colors)                  # [P, C]
            log_tfin = log_tfin + jnp.sum(jnp.where(include, log1m, 0.0), axis=1, keepdims=True)
            return c_idx + 1, cont, log_praw_new, acc, log_tfin

        def cond(carry):
            _, cont, _, _, _ = carry
            return cont

        init = (
            jnp.int32(0),
            n_chunks > 0,
            jnp.zeros((P, 1), jnp.float32),
            jnp.zeros((P, channels), jnp.float32),
            jnp.zeros((P, 1), jnp.float32),
        )
        _, _, _, acc, log_tfin = jax.lax.while_loop(cond, body, init)
        out_ref[j] = acc
        tfin_ref[j] = jnp.exp(log_tfin)


def composite_forward_pallas(feat_t, tile_start, tile_count, bg, *, grid_x, grid_y,
                             channels, tile=16, chunk=256, interpret=False,
                             align=None, tiles_per_step=4, packed_rgb=False):
    """feat_t: [F_pad, D_aligned] transposed entry features with chunk-aligned tile
    segments. Returns (tiles_rgb [T, P, C], tiles_tfin [T, P])."""
    f_pad, D = feat_t.shape
    if packed_rgb:
        assert channels == 3 and f_pad == 8, (channels, f_pad)
    num_tiles = grid_x * grid_y
    P = tile * tile
    tb = max(1, tiles_per_step)
    t_pad = ((num_tiles + tb - 1) // tb) * tb
    if t_pad != num_tiles:
        # Padding tiles carry count 0 (no DMA, immediate loop exit) and an
        # in-range start.
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros((t_pad - num_tiles,), tile_start.dtype)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros((t_pad - num_tiles,), tile_count.dtype)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tb, P, channels), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, tile=tile, chunk=chunk,
                               channels=channels, f_pad=f_pad, grid_x=grid_x,
                               align=align or chunk, tb=tb, packed_rgb=packed_rgb)
    tiles_rgb, tiles_tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, P, channels), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, P, 1), jnp.float32),
        ],
        interpret=interpret,
    )(tile_start, tile_count, feat_t)
    tiles_rgb = tiles_rgb[:num_tiles]
    tiles_tfin = tiles_tfin[:num_tiles, ..., 0]
    tiles_rgb = tiles_rgb + tiles_tfin[..., None] * bg[None, None, :]
    return tiles_rgb, tiles_tfin


# ------------------------------------------------------------------------ backward


def _bwd_kernel(starts_ref, counts_ref, feat_hbm, gbar_ref, total_ref, b_ref,
                tfin_ref, dfeat_hbm, scratch, out_scratch, carry_vmem, sems,
                out_sems, done_smem, *, tile, chunk, channels, f_pad, grid_x,
                align, tb):
    for j in range(tb):
        _bwd_one_tile(starts_ref, counts_ref, feat_hbm, gbar_ref, total_ref,
                      b_ref, tfin_ref, dfeat_hbm, scratch, out_scratch,
                      carry_vmem, sems, out_sems, done_smem, j, tile=tile,
                      chunk=chunk, channels=channels, f_pad=f_pad,
                      grid_x=grid_x, align=align, tb=tb)


def _bwd_one_tile(starts_ref, counts_ref, feat_hbm, gbar_ref, total_ref, b_ref,
                  tfin_ref, dfeat_hbm, scratch, out_scratch, carry_vmem, sems,
                  out_sems, done_smem, j, *, tile, chunk, channels, f_pad,
                  grid_x, align, tb):
    t = pl.program_id(0) * tb + j
    tx = t % grid_x
    ty = t // grid_x
    start = starts_ref[t]
    count = counts_ref[t]
    P = tile * tile
    n_chunks = pl.cdiv(count, chunk)
    px0 = (tx * tile).astype(jnp.float32)
    py0 = (ty * tile).astype(jnp.float32)
    basis = tile_pixel_basis(tile)
    # 2-term Dekker split of u (~2^-16 rel) matches the gradient-accuracy
    # budget of the other kernel contractions (_contract_lanes2) at 2/3 the
    # MXU rows of the original 3-term form; basis is exact in bf16.
    basisT2 = jnp.concatenate([basis.T] * 2, axis=1).astype(jnp.bfloat16)  # [6, 2P]

    gbar = gbar_ref[j]        # [P, C]
    total = total_ref[j]      # [P, 1]
    B = b_ref[j]              # [P, 1]
    tfin = tfin_ref[j]        # [P, 1]
    # Loop-invariant Dekker splits of the pixel cotangents (see _contract_lanes2:
    # 2x2 bf16 blocks minus mid x mid replace 6-pass HIGHEST at ~2^-17 rel).
    gb2r = _dekker2(gbar, 0)  # [2P, C]  (cdotg lhs)
    gb2c = _dekker2(gbar, 1)  # [P, 2C]  (d_colors lhs)

    def get_dma(slot, c_idx):
        return pltpu.make_async_copy(
            feat_hbm.at[:, pl.ds(pl.multiple_of(start + c_idx * chunk, align), chunk)],
            scratch.at[slot],
            sems.at[slot],
        )

    def put_dma(slot, c_idx):
        return pltpu.make_async_copy(
            out_scratch.at[slot],
            dfeat_hbm.at[:, pl.ds(pl.multiple_of(start + c_idx * chunk, align), chunk)],
            out_sems.at[slot],
        )

    @pl.when(n_chunks > 0)
    def _():
        get_dma(0, 0).start()

    done_smem[0] = 0
    carry_vmem[0] = jnp.zeros((P, 1), jnp.float32)   # log_praw
    carry_vmem[1] = jnp.zeros((P, 1), jnp.float32)   # q_carry

    def body(c_idx, _):
        slot = jnp.remainder(c_idx, 2)

        # Reuse of out_scratch[slot] must wait for its previous put.
        @pl.when(c_idx >= 2)
        def _():
            put_dma(slot, c_idx - 2).wait()

        done = done_smem[0] == 1

        # Early exit mirroring the forward's T < 1e-4 termination: every entry past
        # the terminated point has include=False => all its gradients are exactly
        # zero, so later chunks skip the DMA reads and all compute and just flush
        # zeros (the reference backward instead re-walks the full tile list
        # back-to-front from the end, backward.cu:434-478).
        @pl.when(jnp.logical_not(done))
        def _():
            get_dma(slot, c_idx).wait()
            rows = scratch[slot]
            log_praw = carry_vmem[0]
            q_carry = carry_vmem[1]
            valid_len = count - c_idx * chunk
            alpha, aux = _chunk_alpha(rows, valid_len, tile, px0, py0, chunk)
            log1m = jnp.log(1.0 - alpha)
            log_praw_new = jnp.maximum(
                log_praw + jnp.sum(log1m, axis=1, keepdims=True), NEG_LOG_EPS)
            alive = jnp.max(log_praw_new) >= jnp.log(T_EPS)

            # Prefetch before the heavy matmuls, but only if the loop continues.
            @pl.when((c_idx + 1 < n_chunks) & alive)
            def _():
                get_dma(jnp.remainder(c_idx + 1, 2), c_idx + 1).start()

            excl = _prefix_exact(log1m, True) + log_praw
            log_p_inc = excl + log1m
            include = log_p_inc >= jnp.log(T_EPS)
            p_prev = jnp.exp(excl)
            w = jnp.where(include, alpha * p_prev, 0.0)

            colors = rows[6 : 6 + channels, :]                       # [C, CHUNK]
            co = jax.lax.dot(gb2r, _dekker2(colors, 1),
                             preferred_element_type=jnp.float32)     # [2P, 2CHUNK]
            cdotg = co[:P, :chunk] + co[P:, :chunk] + co[:P, chunk:]
            wc = w * cdotg
            q_inc = _prefix_exact(wc, False) + q_carry
            S = total - q_inc                                        # suffix sums

            contrib = include & (~aux["skip"])
            d_alpha = jnp.where(
                contrib, p_prev * cdotg - (S + tfin * B) / (1.0 - alpha), 0.0
            )
            do = jax.lax.dot_general(                                # [2C, 2CHUNK]
                gb2c, _dekker2(w, 1), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d_colors = (do[:channels, :chunk] + do[channels:, :chunk]
                        + do[:channels, chunk:])

            # All five conic/mean gradients are linear recombinations of six pixel
            # moments of u = dL/dG * G = op * d_alpha * G (saturation gradient
            # intentionally UNMASKED, backward.cu:498-499): e.g.
            # d_ca = -0.5 sum_p u dx^2 with dx = mx - px (tile-local basis; the
            # shift cancels in dx). One basis^T @ u matmul contracting the pixel
            # dim replaces five [P, CHUNK] elementwise chains + sublane reductions
            # on the VPU. Recombination cancellation is benign: px in [0, tile) so
            # dx ~ mx whenever |mx| is large.
            u = aux["op"] * d_alpha * aux["G"]                       # [P, CHUNK]
            mom = jax.lax.dot(basisT2, _dekker2(u, 0),
                              preferred_element_type=jnp.float32)    # [6, CHUNK]
            M0, Mx, My = mom[0:1], mom[1:2], mom[2:3]
            Mxx, Myy, Mxy = mom[3:4], mom[4:5], mom[5:6]
            mx = rows[0:1, :] - px0
            my = rows[1:2, :] - py0
            ca, cb, cc = aux["ca"], aux["cb"], aux["cc"]
            Sx = mx * M0 - Mx                                        # sum u*dx
            Sy = my * M0 - My                                        # sum u*dy
            Sxx = mx * mx * M0 - 2.0 * mx * Mx + Mxx                 # sum u*dx^2
            Syy = my * my * M0 - 2.0 * my * My + Myy
            Sxy = mx * my * M0 - mx * My - my * Mx + Mxy
            d_mx = -(ca * Sx + cb * Sy)
            d_my = -(cc * Sy + cb * Sx)
            d_ca = -0.5 * Sxx
            d_cb = -Sxy
            d_cc = -0.5 * Syy
            d_op = M0 / jnp.maximum(aux["op"], 1e-30)                # sum G*d_alpha

            out_scratch[slot, 0:1] = d_mx
            out_scratch[slot, 1:2] = d_my
            out_scratch[slot, 2:3] = d_ca
            out_scratch[slot, 3:4] = d_cb
            out_scratch[slot, 4:5] = d_cc
            out_scratch[slot, 5:6] = d_op
            out_scratch[slot, 6 : 6 + channels] = d_colors

            @pl.when(6 + channels < f_pad)
            def _():
                out_scratch[slot, 6 + channels :] = jnp.zeros(
                    (f_pad - 6 - channels, chunk), jnp.float32
                )

            carry_vmem[0] = log_praw_new
            carry_vmem[1] = q_carry + jnp.sum(wc, axis=1, keepdims=True)
            done_smem[0] = jnp.where(alive, 0, 1)

        @pl.when(done)
        def _():
            out_scratch[slot] = jnp.zeros((f_pad, chunk), jnp.float32)

        put_dma(slot, c_idx).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)

    @pl.when(n_chunks >= 2)
    def _():
        put_dma(jnp.remainder(n_chunks - 2, 2), n_chunks - 2).wait()

    @pl.when(n_chunks >= 1)
    def _():
        put_dma(jnp.remainder(n_chunks - 1, 2), n_chunks - 1).wait()


def composite_backward_pallas(feat_t, tile_start, tile_count, bg, tiles_rgb,
                              tiles_tfin, g_tiles, g_tfin, *, grid_x, grid_y,
                              channels, tile=16, chunk=256, interpret=False,
                              align=None, tiles_per_step=4):
    """Analytic backward on TPU. Returns (d_feat_t [F_pad, D], d_bg [C]).

    Args:
        tiles_rgb/tiles_tfin: forward outputs (residuals).
        g_tiles: [T, P, C] pixel cotangents; g_tfin: [T, P].
    """
    f_pad, D = feat_t.shape
    num_tiles = grid_x * grid_y
    P = tile * tile

    # Per-pixel scalars precomputed outside the kernel (cheap elementwise):
    # total = (out - tfin*bg).gbar ;  B = bg.gbar + gbar_tfin.
    total = jnp.sum((tiles_rgb - tiles_tfin[..., None] * bg) * g_tiles, axis=-1)
    B = g_tiles @ bg + g_tfin
    d_bg = jnp.einsum("tp,tpc->c", tiles_tfin, g_tiles)

    tb = max(1, tiles_per_step)
    t_pad = ((num_tiles + tb - 1) // tb) * tb
    if t_pad != num_tiles:
        pad = t_pad - num_tiles
        tile_start = jnp.concatenate(
            [tile_start, jnp.zeros((pad,), tile_start.dtype)])
        tile_count = jnp.concatenate(
            [tile_count, jnp.zeros((pad,), tile_count.dtype)])
        padt = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        g_tiles, total, B, tiles_tfin_p = (padt(g_tiles), padt(total), padt(B),
                                           padt(tiles_tfin))
    else:
        tiles_tfin_p = tiles_tfin

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_pad // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                       # feat_t
            pl.BlockSpec((tb, P, channels), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, P, 1), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, chunk), jnp.float32),
            pltpu.VMEM((2, f_pad, chunk), jnp.float32),
            pltpu.VMEM((2, P, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((1,), jnp.int32),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tile=tile, chunk=chunk,
                               channels=channels, f_pad=f_pad, grid_x=grid_x,
                               align=align or chunk, tb=tb)
    d_feat_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((f_pad, D), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(
        tile_start, tile_count, feat_t, g_tiles,
        total[..., None], B[..., None], tiles_tfin_p[..., None],
    )
    return d_feat_t, d_bg
