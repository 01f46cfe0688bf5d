"""Data-parallel training-step tests on the 8-device virtual CPU mesh: the sharded
step must produce the same parameter update as an unsharded replica of the same
batched computation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
from relightable3dgaussians_w_tpu.parallel.data_parallel import (
    CameraBatch, make_dp_train_step, shard_train_state,
)
from relightable3dgaussians_w_tpu.models.nets import MLPNet

from test_train_step import build_setup


def make_batch(B, H=64, W=64, seed=0):
    from test_train_step import build_setup as bs
    _, _, cam, gt, sky, occ, _ = bs()
    rng = np.random.RandomState(seed)
    return CameraBatch(
        viewmat=jnp.stack([cam.viewmat] * B),
        projmat=jnp.stack([cam.projmat] * B),
        campos=jnp.stack([cam.campos] * B),
        tan_fovx=jnp.stack([cam.tan_fovx] * B),
        tan_fovy=jnp.stack([cam.tan_fovy] * B),
        gt_image=jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        sky_mask=jnp.ones((B, H, W), jnp.float32),
        occluders_mask=jnp.ones((B, H, W), jnp.float32),
        uid=jnp.arange(B) % 3,
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_matches_single_device():
    tstate, fns, cam, gt, sky, occ, cfg = build_setup()
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig

    rcfg = RasterizerConfig(width=64, height=64, max_dup=1 << 14,
                            max_tiles_per_gauss=32, lmax_per_tile=256, tile_chunk=4)
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    B = 4
    batch = make_batch(B)
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    bg = jnp.zeros(3)

    # Single-device reference: same batched step on a trivial 1x1 mesh. The dp step
    # donates its input state, so build a fresh (identical) state per mesh.
    mesh1 = make_mesh(data=1, gauss=1)
    with mesh1:
        step1 = make_dp_train_step(mlp, cfg, rcfg, mesh1)
        s1 = shard_train_state(tstate, mesh1)
        s1, m1 = step1(s1, batch, keys, bg)

    tstate2, *_ = build_setup()
    mesh = make_mesh(data=4, gauss=2)
    with mesh:
        step = make_dp_train_step(mlp, cfg, rcfg, mesh)
        s = shard_train_state(tstate2, mesh)
        s, m = step(s, batch, keys, bg)

    assert np.isfinite(float(m["loss"]))
    np.testing.assert_allclose(float(m["loss"]), float(m1["loss"]), rtol=1e-5)
    # Updated Gaussian positions agree between the sharded and unsharded runs.
    np.testing.assert_allclose(
        np.asarray(s.params["gaussians"].xyz), np.asarray(s1.params["gaussians"].xyz),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s.params["embeddings"]), np.asarray(s1.params["embeddings"]),
        atol=1e-6,
    )
