"""Tile-parallel rendering must be a bitwise-equal decomposition of the
single-device render: preprocess is replicated (identical math) and every tile's
entry list is self-contained, so concatenated bands == the full image."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
from relightable3dgaussians_w_tpu.parallel.tile_parallel import render_tile_sharded
from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

from test_rasterize import make_scene


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tile_sharded_matches_single_device():
    # H=128 -> grid_y=8 -> one tile row per device on the 8-device mesh.
    arrs, cam, cfg, host = make_scene(n=300, seed=5, W=64, H=128)
    cfg = cfg._replace(max_dup=1 << 15)
    mesh = make_mesh(data=8)

    ref_img, ref_aux = rasterize(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"], cam, cfg)

    img, alpha = render_tile_sharded(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"], cam, cfg, mesh)

    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref_img))
    np.testing.assert_array_equal(np.asarray(alpha), np.asarray(ref_aux.alpha))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tile_sharded_rejects_indivisible_grid():
    arrs, cam, cfg, _ = make_scene(n=50, seed=1, W=64, H=80)  # grid_y=5
    mesh = make_mesh(data=8)
    with pytest.raises(ValueError):
        render_tile_sharded(arrs["means3d"], arrs["scales"], arrs["quats"],
                            arrs["opacities"], arrs["colors"], arrs["bg"], cam, cfg, mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tile_parallel_raster_fn_through_renderer():
    """The raster_fn adapter (the eval/render consumer, cli/render.py
    make_eval_raster_fn) must return a full (image, RasterizeAux) bitwise equal
    to the single-device rasterize, including the aux counters."""
    from relightable3dgaussians_w_tpu.parallel.tile_parallel import (
        make_tile_parallel_raster_fn)

    arrs, cam, cfg, host = make_scene(n=300, seed=7, W=64, H=128)
    cfg = cfg._replace(max_dup=1 << 15)
    mesh = make_mesh(data=8)
    raster_fn = make_tile_parallel_raster_fn(mesh, "data")

    ref_img, ref_aux = rasterize(
        arrs["means3d"], arrs["scales"], arrs["quats"], arrs["opacities"],
        arrs["colors"], arrs["bg"], cam, cfg)
    img, aux = raster_fn(arrs["means3d"], arrs["scales"], arrs["quats"],
                         arrs["opacities"], arrs["colors"], arrs["bg"], cam, cfg)

    np.testing.assert_array_equal(np.asarray(img), np.asarray(ref_img))
    np.testing.assert_array_equal(np.asarray(aux.alpha), np.asarray(ref_aux.alpha))
    np.testing.assert_array_equal(np.asarray(aux.radii), np.asarray(ref_aux.radii))
    assert int(aux.overflow) == int(ref_aux.overflow)
