"""Gauss-sharded rendering (pool sharded over `gauss`, binning via tile-ownership
all-to-all) must be a bitwise-equal decomposition of the single-device render,
and its lowered HLO must contain an all-to-all — NOT a full-pool all-gather
(VERDICT r1 Missing #1; SURVEY.md §5.8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
from relightable3dgaussians_w_tpu.parallel.gauss_shard import render_gauss_sharded
from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

from test_rasterize import make_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gauss_sharded_matches_single_device():
    # n divisible by 8; H=128 -> grid_y=8 -> one tile row band per device.
    arrs, cam, cfg, host = make_scene(n=320, seed=3, W=64, H=128)
    cfg = cfg._replace(max_dup=1 << 15)
    mesh = make_mesh(gauss=8)

    ref_img, ref_aux = rasterize(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"], cam, cfg)

    img, alpha, overflow = render_gauss_sharded(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"], cam, cfg, mesh)

    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref_img))
    np.testing.assert_array_equal(np.asarray(alpha), np.asarray(ref_aux.alpha))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gauss_sharded_hlo_all_to_all_not_all_gather():
    arrs, cam, cfg, host = make_scene(n=320, seed=3, W=64, H=128)
    cfg = cfg._replace(max_dup=1 << 15)
    mesh = make_mesh(gauss=8)

    def f(means, scales, quats, opac, colors, bg):
        return render_gauss_sharded(means, scales, quats, opac, colors, bg,
                                    cam, cfg, mesh, rows_per_band=64)

    hlo = jax.jit(f).lower(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"]).compile().as_text()
    assert "all-to-all" in hlo, "binning exchange must lower to all-to-all"
    assert "all-gather" not in hlo, "pool must NOT be all-gathered"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gauss_sharded_budget_overflow_is_loud():
    arrs, cam, cfg, host = make_scene(n=320, seed=3, W=64, H=128)
    cfg = cfg._replace(max_dup=1 << 15)
    mesh = make_mesh(gauss=8)
    _, _, overflow = render_gauss_sharded(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"], cam, cfg, mesh, rows_per_band=1)
    assert int(overflow) > 0
