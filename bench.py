"""Headline benchmark: rasterizer fwd+bwd throughput (pixels/s/chip) at 1M Gaussians.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md): `vs_baseline` is measured against a
nominal 100 Mpix/s fwd+bwd for the reference CUDA rasterizer at ~1M Gaussians on an
A100-class GPU (derived from typical 3DGS training-iteration timings; the reference's
own training step invokes that rasterizer ~10x per iteration, which this framework
fuses into one pass).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

NOMINAL_BASELINE_PIX_S = 100e6

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build(n, W, H, seed=0):
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from __graft_entry__ import _camera

    rng = np.random.RandomState(seed)
    means = np.stack([
        rng.uniform(-2.5, 2.5, n), rng.uniform(-2.5, 2.5, n), rng.uniform(1.0, 10.0, n)
    ], -1).astype(np.float32)
    # Scales sized so mean tile coverage stays realistic (~2-6 tiles/Gaussian).
    scales = rng.uniform(0.002, 0.012, (n, 3)).astype(np.float32)
    # BENCH_ANISO > 1 stretches one axis to emulate trained splats (surfels are
    # strongly anisotropic after the planar prior); duplication factor rises.
    aniso = float(os.environ.get("BENCH_ANISO", 1.0))
    if aniso != 1.0:
        scales[:, 0] *= aniso
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.9, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cam = _camera(W, H)
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1" and jax.default_backend() == "tpu"
    arrs = tuple(jnp.asarray(a) for a in (means, scales, quats, opac, colors))

    # Size the static entry budget from the actual count (+5% headroom), like the
    # reference sizes its key buffer from the scanned duplicate count
    # (rasterizer_impl.cu:280-285) — the overflow counter still reports any clamp.
    # BENCH_ROW_INTERVALS: 1/0 force, "auto" (default) enables the exact per-row
    # ellipse culling when the measured interval cut >= 15% (clears the ~3%
    # interval-machinery cost; same policy as trainer._probe_entry_demand).
    max_dup = int(os.environ.get("BENCH_MAX_DUP", 0))
    row_env = os.environ.get("BENCH_ROW_INTERVALS", "auto")
    row_iv = row_env == "1"
    # BENCH_SKIP_ALPHA: serving LOD threshold (RasterizerConfig.skip_alpha);
    # default 1/255 = reference-exact. e.g. BENCH_SKIP_ALPHA=0.0156 (1/64).
    skip_alpha = float(os.environ.get("BENCH_SKIP_ALPHA", 1.0 / 255.0))
    if max_dup == 0 or row_env == "auto":
        from relightable3dgaussians_w_tpu.ops.preprocess import (
            preprocess, row_intervals)

        def count(m, s, q, o):
            pre = preprocess(m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx,
                             cam.tan_fovy, W, H, 16, opacities=o,
                             skip_alpha=skip_alpha)
            return (jnp.sum(pre.tiles_touched),
                    jnp.sum(row_intervals(pre, o, skip_alpha=skip_alpha)[0]))

        rect_total, iv_total = (int(x) for x in jax.jit(count)(*arrs[:3], arrs[3]))
        if row_env == "auto":
            # Intervals pay only in fwd+bwd: the smaller static budget feeds
            # sort+gather+segsum+composite-bwd. Forward-only rendering measured
            # them a NET COST even at aniso-8 (exp_r5a/b: iso 45.0 -> 55.4,
            # aniso 101.8 -> 107.1) — keep them off in render mode.
            cut = 1.0 - iv_total / max(rect_total, 1)
            row_iv = cut >= 0.15 and os.environ.get("BENCH_MODE", "train") == "train"
        # Sort/gather/segment-sum costs scale with the STATIC budget, not the
        # live entry count — the interval win only materializes through a
        # smaller max_dup.
        total = iv_total if row_iv else rect_total
        if max_dup == 0:
            max_dup = min(max(((int(total * 1.05) + 4095) // 4096) * 4096, 4096),
                          1 << 23)

    cfg = RasterizerConfig(
        width=W, height=H,
        max_dup=max_dup,
        max_tiles_per_gauss=16,
        lmax_per_tile=int(os.environ.get("BENCH_LMAX", 4096)),
        tile_chunk=int(os.environ.get("BENCH_TILE_CHUNK", 8)),
        use_pallas=use_pallas,
        pallas_chunk=int(os.environ.get("BENCH_CHUNK", 512)),
        row_intervals=row_iv,
        skip_alpha=skip_alpha,
        # BENCH_PACKED=1 (render mode only): 12-bit packed R/B entry colors
        # halve the frame's feature-gather bytes (~9.8e-4 max deviation).
        packed_rgb=(os.environ.get("BENCH_PACKED", "0") == "1"
                    and os.environ.get("BENCH_MODE", "train") == "render"),
    )
    return arrs, cam, cfg


def main():
    from relightable3dgaussians_w_tpu.ops.rasterize import (
        rasterize, make_rasterize_grad_split)

    n = int(os.environ.get("BENCH_N", 1_000_000))
    W = H = int(os.environ.get("BENCH_RES", 800))
    iters = int(os.environ.get("BENCH_ITERS", 10))
    split = os.environ.get("BENCH_SPLIT", "1") == "1"
    mode = os.environ.get("BENCH_MODE", "train")  # train (fwd+bwd) | render (fwd)
    arrs, cam, cfg = build(n, W, H)
    bg = jnp.zeros(3, jnp.float32)

    if mode == "render":
        # Inference/serving throughput: forward-only novel-view rendering.
        fwd = jax.jit(lambda a: rasterize(*a, bg, cam, cfg))
        img, aux = fwd(arrs)
        overflow = int(aux.overflow)
        float(jnp.sum(img[:1, :1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            img, aux = fwd(arrs)
        float(jnp.sum(img[:1, :1]))
        dt = (time.perf_counter() - t0) / iters
        extra = {"ms_per_frame": dt * 1e3, "fps": 1.0 / dt,
                 "overflow_entries": overflow,
                 "backend": jax.devices()[0].platform,
                 "pallas": cfg.use_pallas}
        extra.update(_maybe_pie(arrs, cam, cfg, bg, dt, mode="render"))
        print(json.dumps({
            "metric": f"splat_render_pixels_per_s_{n}g_{W}x{H}",
            "value": W * H / dt,
            "unit": "pixels/s/chip",
            "vs_baseline": (W * H / dt) / NOMINAL_BASELINE_PIX_S,
            "extra": extra,
        }))
        return

    def img_loss(img, aux):
        return jnp.sum(img) + jnp.sum(aux.alpha)

    def loss_fn(means, scales, quats, opac, colors):
        img, aux = rasterize(means, scales, quats, opac, colors, bg, cam, cfg)
        return img_loss(img, aux)

    if split:
        # Three dispatches with preprocess outputs staged as program parameters
        # (make_rasterize_grad_split) — the fused one-program grad compiles to a
        # 2-4x slower backward schedule on v5e (BENCH_LOG.md).
        split_step = make_rasterize_grad_split(cam, cfg, img_loss)
        step = lambda m, s, q, o, c: split_step(m, s, q, o, c, bg)[1]
    else:
        step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4)))

    def pull(out):
        # Force a 4-byte scalar transfer: under the axon tunnel,
        # jax.block_until_ready can return before Pallas-containing programs
        # finish; a scalar reduction read-back is reliable.
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return float(sum(jnp.sum(l.astype(jnp.float32)) for l in leaves))

    # Warmup / compile + overflow sanity.
    _, aux = jax.jit(lambda a: rasterize(*a, bg, cam, cfg))(arrs)
    overflow = int(aux.overflow)
    g = step(*arrs)
    pull(g)

    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*arrs)
    pull(g)
    dt = (time.perf_counter() - t0) / iters

    pix_s = W * H / dt

    parity = None
    if os.environ.get("BENCH_PARITY", "0") == "1":
        from scripts.tpu_parity import run as parity_run

        parity = parity_run(quiet=True)

    extra = {"ms_per_iter": dt * 1e3, "overflow_entries": overflow,
             "backend": jax.devices()[0].platform, "pallas": cfg.use_pallas,
             "split": split,
             **({"parity": parity} if parity is not None else {})}
    extra.update(_maybe_pie(arrs, cam, cfg, bg, dt, mode="train"))
    print(json.dumps({
        "metric": f"splat_fwd_bwd_pixels_per_s_{n}g_{W}x{H}",
        "value": pix_s,
        "unit": "pixels/s/chip",
        "vs_baseline": pix_s / NOMINAL_BASELINE_PIX_S,
        "extra": extra,
    }))


def _maybe_pie(arrs, cam, cfg, bg, dt, mode):
    """Measured stage pie + speed-of-light fraction (scripts/stage_pie.py):
    sol_pct = (sum of isolated stage-floor times) / end-to-end — the externally
    legible form of BENCH_LOG's roofline attribution (VERDICT r4 item 3a).
    BENCH_PIE=0 skips the extra stage compiles."""
    if os.environ.get("BENCH_PIE", "1") != "1" or not cfg.use_pallas:
        return {}
    try:
        from scripts.stage_pie import measure_stage_pie, sol_pct

        pie = measure_stage_pie(arrs, cam, cfg, bg, mode=mode)
        return {
            "stage_pie_ms": {k: round(v, 2) for k, v in pie.items()},
            "sol_pct": round(100.0 * sol_pct(pie, dt * 1e3), 1),
        }
    except Exception as e:  # the headline number must survive a pie failure
        return {"stage_pie_error": str(e)[:200]}


if __name__ == "__main__":
    main()
