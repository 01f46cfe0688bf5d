"""Forward / backward parity tests for the rasterizer against the brute-force oracle
and between the analytic custom_vjp backward and the plain-autodiff twin (the
reference repo's twin-implementation discipline, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.ops import RasterizerConfig, CameraMatrices, rasterize
from relightable3dgaussians_w_tpu.utils.graphics import projection_matrix

from oracle import splat_oracle


def make_scene(n=200, seed=0, W=64, H=64, channels=3, max_op=0.95):
    rng = np.random.RandomState(seed)
    means = np.zeros((n, 3))
    means[:, 0] = rng.uniform(-1.2, 1.2, n)
    means[:, 1] = rng.uniform(-1.2, 1.2, n)
    means[:, 2] = rng.uniform(1.0, 6.0, n)
    scales = rng.uniform(0.02, 0.12, (n, 3))
    quats = rng.normal(size=(n, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    opac = rng.uniform(0.1, max_op, n)
    colors = rng.uniform(0, 1, (n, channels))
    bg = rng.uniform(0, 1, channels)

    viewmat = np.eye(4)
    fov = math_radians(60)
    proj = projection_matrix(0.01, 100.0, fov, fov).astype(np.float64)
    full = proj @ viewmat
    tanf = np.tan(fov / 2)
    cam = CameraMatrices(
        viewmat=jnp.asarray(viewmat, jnp.float32),
        projmat=jnp.asarray(full, jnp.float32),
        campos=jnp.zeros(3, jnp.float32),
        tan_fovx=jnp.float32(tanf),
        tan_fovy=jnp.float32(tanf),
    )
    cfg = RasterizerConfig(width=W, height=H, max_dup=1 << 14, max_tiles_per_gauss=32,
                           lmax_per_tile=512, tile_chunk=4)
    arrs = dict(
        means3d=jnp.asarray(means, jnp.float32),
        scales=jnp.asarray(scales, jnp.float32),
        quats=jnp.asarray(quats, jnp.float32),
        opacities=jnp.asarray(opac, jnp.float32),
        colors=jnp.asarray(colors, jnp.float32),
        bg=jnp.asarray(bg, jnp.float32),
    )
    host = dict(means=means, scales=scales, quats=quats, opac=opac, colors=colors,
                bg=bg, viewmat=viewmat, projmat=full, tanf=tanf, W=W, H=H)
    return arrs, cam, cfg, host


def math_radians(deg):
    return deg * np.pi / 180.0


def test_forward_matches_oracle():
    arrs, cam, cfg, host = make_scene()
    img, aux = jax.jit(rasterize, static_argnames=("cfg",))(cam=cam, cfg=cfg, **arrs)
    assert int(aux.overflow) == 0

    ref_img, ref_radii, ref_T = splat_oracle(
        host["means"], host["scales"], host["quats"], host["opac"], host["colors"],
        host["bg"], host["viewmat"], host["projmat"], host["tanf"], host["tanf"],
        host["W"], host["H"],
    )
    np.testing.assert_array_equal(np.asarray(aux.radii), ref_radii)
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4)
    np.testing.assert_allclose(1.0 - np.asarray(aux.alpha), ref_T, atol=2e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_grad_custom_vjp_vs_autodiff(seed):
    arrs, cam, cfg, host = make_scene(seed=seed)
    key = jax.random.PRNGKey(seed)
    wimg = jax.random.normal(key, (host["H"], host["W"], 3))
    walpha = jax.random.normal(jax.random.fold_in(key, 1), (host["H"], host["W"]))

    def loss(means3d, scales, quats, opacities, colors, bg, twin):
        img, aux = rasterize(means3d, scales, quats, opacities, colors, bg, cam, cfg,
                             use_autodiff_twin=twin)
        return jnp.sum(img * wimg) + jnp.sum(aux.alpha * walpha)

    argnums = (0, 1, 2, 3, 4, 5)
    g_custom = jax.grad(loss, argnums)(*[arrs[k] for k in
                                         ("means3d", "scales", "quats", "opacities", "colors", "bg")], False)
    g_auto = jax.grad(loss, argnums)(*[arrs[k] for k in
                                       ("means3d", "scales", "quats", "opacities", "colors", "bg")], True)
    names = ("means3d", "scales", "quats", "opacities", "colors", "bg")
    for name, gc, ga in zip(names, g_custom, g_auto):
        scale = np.maximum(np.abs(np.asarray(ga)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gc), np.asarray(ga), atol=2e-4 * scale, rtol=2e-3,
            err_msg=f"grad mismatch for {name}",
        )


def test_mean2d_probe_gradient():
    arrs, cam, cfg, host = make_scene(n=50)
    probe = jnp.zeros((50, 2))

    def loss(probe, twin):
        img, _ = rasterize(**arrs, cam=cam, cfg=cfg, mean2d_probe=probe,
                           use_autodiff_twin=twin)
        return jnp.sum(img**2)

    gc = jax.grad(loss)(probe, False)
    ga = jax.grad(loss)(probe, True)
    assert np.abs(np.asarray(gc)).max() > 0
    np.testing.assert_allclose(np.asarray(gc), np.asarray(ga), atol=1e-4, rtol=2e-3)


def test_multichannel_fused_aovs():
    arrs, cam, cfg, host = make_scene(channels=19)
    img, aux = rasterize(**arrs, cam=cam, cfg=cfg)
    assert img.shape == (host["H"], host["W"], 19)
    ref_img, _, _ = splat_oracle(
        host["means"], host["scales"], host["quats"], host["opac"], host["colors"],
        host["bg"], host["viewmat"], host["projmat"], host["tanf"], host["tanf"],
        host["W"], host["H"],
    )
    np.testing.assert_allclose(np.asarray(img), ref_img, atol=2e-4)


def test_bin_gaussians_aligned_matches_two_stage():
    """bin_gaussians_aligned (histogram + padded single sort) must produce the exact
    aligned layout of bin_gaussians + align_entries (reference two-stage pipeline)."""
    import numpy as np
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.ops.binning import (
        bin_gaussians, align_entries, bin_gaussians_aligned)

    arrs, cam, cfg, _ = make_scene(seed=3, n=400)
    chunk = 8
    pre = preprocess(arrs["means3d"], arrs["scales"], arrs["quats"],
                     cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
                     cfg.width, cfg.height, cfg.tile)
    from relightable3dgaussians_w_tpu.ops.pallas.segment_sum import MACRO
    num_tiles = cfg.grid_x * cfg.grid_y
    d_aligned = cfg.max_dup + num_tiles * chunk
    d_aligned = ((d_aligned + MACRO - 1) // MACRO) * MACRO
    binning = bin_gaussians(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup)
    ref = align_entries(binning, num_tiles, chunk, d_aligned)
    xla = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup, chunk,
                                use_expand_kernel=False)
    # Pallas expand-kernel path (interpret on CPU); needs a 4096-multiple budget.
    kern = bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, cfg.max_dup, chunk,
                                 interpret=True, use_expand_kernel=True)
    assert cfg.max_dup % 4096 == 0, "test must exercise the expand kernel"

    for out in (xla, kern):
        assert int(out.overflow) == 0
        np.testing.assert_array_equal(np.asarray(out.tile_start), np.asarray(ref.tile_start))
        np.testing.assert_array_equal(np.asarray(out.tile_count), np.asarray(ref.tile_count))
        np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
        # gauss ids must agree on valid entries (padding ids are unconstrained).
        v = np.asarray(ref.valid)
        np.testing.assert_array_equal(np.asarray(out.gauss_id)[v], np.asarray(ref.gauss_id)[v])
        assert int(out.num_entries) == int(binning.num_entries)
