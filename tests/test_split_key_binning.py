"""2-key (tile, rank) aligned binning must be bitwise-identical to the packed
single-u32-key path — the layout pools >= ~4M at 800^2 take (rank_bits +
tile_bits > 32), exercised here via force_split_key on a small scene."""

import numpy as np
import jax

from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
from relightable3dgaussians_w_tpu.ops.binning import bin_gaussians_aligned

from test_rasterize import make_scene


def _aligned(arrs, cam, cfg, force_split, use_kernel):
    pre = preprocess(
        arrs["means3d"], arrs["scales"], arrs["quats"], cam.viewmat, cam.projmat,
        cam.tan_fovx, cam.tan_fovy, cfg.width, cfg.height, cfg.tile,
        opacities=arrs["opacities"])
    return bin_gaussians_aligned(pre, cfg.grid_x, cfg.grid_y, 1 << 14, 128,
                                 interpret=True, use_expand_kernel=use_kernel,
                                 force_split_key=force_split)


def test_split_key_matches_single_key():
    arrs, cam, cfg, _ = make_scene(n=400, seed=5, W=64, H=64)
    for use_kernel in (False, True):
        a1 = jax.jit(lambda: _aligned(arrs, cam, cfg, False, use_kernel))()
        a2 = jax.jit(lambda: _aligned(arrs, cam, cfg, True, use_kernel))()
        for f in ("gauss_id", "valid", "tile_start", "tile_count",
                  "num_entries", "overflow"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a1, f)), np.asarray(getattr(a2, f)),
                err_msg=f"{f} (use_expand_kernel={use_kernel})")
