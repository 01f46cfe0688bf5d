"""Per-tile-row ellipse-interval culling must be image- and gradient-FREE.

Every (Gaussian, tile) pair the intervals drop satisfies alpha < 1/255 at all
of the tile's pixels, which both compositors skip with exactly-zero gradients
(forward.cu:329-335, backward.cu:490-496) — so the render and all parameter
gradients must match the rect-based binning while the entry count drops.
"""

import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.ops.preprocess import (
    preprocess, row_intervals, H_CAP)
from relightable3dgaussians_w_tpu.ops.binning import (
    bin_gaussians_aligned, tile_histogram_intervals)
from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

from test_rasterize import make_scene


def _aniso_scene(n=400, seed=3, W=128, H=128):
    arrs, cam, cfg, host = make_scene(n=n, seed=seed, W=W, H=H)
    # Stretch one axis so rects overshoot the ellipse (trained-splat regime).
    scales = np.asarray(arrs["scales"]).copy()
    scales[:, 0] *= 6.0
    arrs["scales"] = jnp.asarray(scales)
    cfg = cfg._replace(max_dup=1 << 16, use_pallas=True, pallas_interpret=True,
                      pallas_chunk=128, align_chunk=128)
    return arrs, cam, cfg


def _pre(arrs, cam, cfg):
    return preprocess(
        arrs["means3d"], arrs["scales"], arrs["quats"], cam.viewmat,
        cam.projmat, cam.tan_fovx, cam.tan_fovy, cfg.width, cfg.height,
        cfg.tile, 1.0, None, None, arrs["opacities"])


def test_interval_counts_match_histogram():
    """The per-Gaussian interval counts and the per-tile interval histogram are
    two routes to the same total — they must agree exactly (offsets depend on
    it), and must never exceed the rect counts."""
    arrs, cam, cfg = _aniso_scene()
    pre = _pre(arrs, cam, cfg)
    counts, packed = row_intervals(pre, arrs["opacities"], cfg.tile)
    hist = tile_histogram_intervals(pre, packed, cfg.grid_x, cfg.grid_y)
    assert int(jnp.sum(counts)) == int(jnp.sum(hist))
    assert bool(jnp.all(counts <= pre.tiles_touched))
    # The aniso scene must actually cut something.
    assert int(jnp.sum(counts)) < int(jnp.sum(pre.tiles_touched)) * 0.95


def test_interval_render_and_grads_match_rects():
    arrs, cam, cfg = _aniso_scene()

    def run(flag):
        c = cfg._replace(row_intervals=flag)

        def loss(means, scales, quats, opac, colors):
            img, aux = rasterize(means, scales, quats, opac, colors,
                                 arrs["bg"], cam, c)
            return jnp.sum(img * img) + jnp.sum(aux.alpha), (img, aux)

        (l, (img, aux)), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3, 4), has_aux=True)(
            arrs["means3d"], arrs["scales"], arrs["quats"],
            arrs["opacities"], arrs["colors"])
        return l, img, aux, grads

    l0, img0, aux0, g0 = run(False)
    l1, img1, aux1, g1 = run(True)

    assert int(aux1.num_entries) < int(aux0.num_entries)
    assert int(aux1.overflow) == 0 and int(aux0.overflow) == 0
    # Dropped entries contribute exact zeros (brute-force-verified: max alpha
    # among dropped pairs on this scene is 3.87e-3 < 1/255), so the image is
    # reduction-noise equal. Gradients additionally see the composite kernel's
    # 2-pass Dekker prefix matmuls re-blocked at the new entry counts — the
    # same ~2^-16-class wobble the kernel-vs-twin TPU parity probe bounds at
    # <= 2.3e-4 of max; gate at that class.
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img0),
                               atol=2e-6, rtol=0)
    np.testing.assert_allclose(np.asarray(aux1.alpha), np.asarray(aux0.alpha),
                               atol=2e-6, rtol=0)
    for a, b in zip(g0, g1):
        scale = np.abs(np.asarray(a)).max() + 1e-12
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4 * scale, rtol=0)


def test_interval_xla_twin_matches_kernel_layout():
    """The XLA fallback expansion and the Pallas expand kernel must produce the
    IDENTICAL aligned layout under intervals (twin discipline)."""
    arrs, cam, cfg = _aniso_scene(n=300)
    pre = _pre(arrs, cam, cfg)
    intervals = row_intervals(pre, arrs["opacities"], cfg.tile)
    a_k = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, 1 << 14, 128,
                                interpret=True, use_expand_kernel=True,
                                intervals=intervals)
    a_x = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, 1 << 14, 128,
                                interpret=True, use_expand_kernel=False,
                                intervals=intervals)
    vk = np.asarray(a_k.valid)
    np.testing.assert_array_equal(vk, np.asarray(a_x.valid))
    # gauss_id on INVALID slots is unconstrained garbage (kernel writes 0, the
    # twin's clipped gather writes the last row) — compare where valid.
    np.testing.assert_array_equal(np.asarray(a_k.gauss_id)[vk],
                                  np.asarray(a_x.gauss_id)[vk])
    np.testing.assert_array_equal(np.asarray(a_k.tile_start), np.asarray(a_x.tile_start))
    assert int(a_k.num_entries) == int(a_x.num_entries)
