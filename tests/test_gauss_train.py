"""Gauss-sharded TRAINING: gradients through the tile-ownership all-to-all.

VERDICT r2 item 2: the all-to-all render must be differentiable, carry the fused
AOV channels, and be what the training step actually uses when gauss > 1 — with
the full train-step gradients matching the single-device path and the lowered HLO
containing an all-to-all and NO pool-sized all-gather.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.config import Config
from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
from relightable3dgaussians_w_tpu.parallel.gauss_shard import rasterize_gauss_sharded
from relightable3dgaussians_w_tpu.train_step import forward_loss

from __graft_entry__ import _synthetic_scene, _camera

N_POOL = 1024  # divisible by 8; distinctive in HLO shape strings
W, H = 32, 128  # grid_y = 8 -> one tile-row band per device


def _setup():
    cfg = Config()
    cfg.optimizer.reg_normal_from_iter = 0
    params_g, gstate = _synthetic_scene(n=700, n_sky=100, cap=N_POOL)
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    key = jax.random.PRNGKey(0)
    params = {
        "gaussians": params_g,
        "mlp": init_mlp(key, mlp),
        "embeddings": init_embeddings(jax.random.fold_in(key, 1), 2),
    }
    rcfg = RasterizerConfig(width=W, height=H, max_dup=1 << 14,
                            max_tiles_per_gauss=16, lmax_per_tile=256,
                            tile_chunk=2)
    cam = _camera(W, H)
    rng = np.random.RandomState(5)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    ones = jnp.ones((H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    k = jax.random.PRNGKey(3)
    args = (params, gstate, jnp.zeros((N_POOL, 2)), mlp, cam, gt, ones, ones,
            jnp.asarray(0), k, jnp.asarray(100), cfg, rcfg, bg)
    return args


def _loss_grads(args, raster_fn):
    params, gstate, probe = args[0], args[1], args[2]

    def f(params, probe):
        return forward_loss(params, gstate, probe, *args[3:11],
                            cfg=args[11], rcfg=args[12], bg_color=args[13],
                            raster_fn=raster_fn)

    (loss, aux), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, probe)
    return loss, aux, grads


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gauss_sharded_train_grads_match_single_device():
    args = _setup()
    mesh = make_mesh(gauss=8)

    def raster_fn(xyz, scales, quats, opacity, colors, bg, cam, rc,
                  mean2d_probe=None, active=None):
        return rasterize_gauss_sharded(xyz, scales, quats, opacity, colors, bg,
                                       cam, rc, mesh, mean2d_probe=mean2d_probe,
                                       active=active)

    loss_ref, aux_ref, grads_ref = _loss_grads(args, None)
    with mesh:
        loss_sh, aux_sh, grads_sh = _loss_grads(args, raster_fn)

    assert int(aux_sh["overflow"]) == 0
    np.testing.assert_allclose(float(loss_sh), float(loss_ref), rtol=1e-5)

    flat_ref, _ = jax.tree_util.tree_flatten(grads_ref)
    flat_sh, _ = jax.tree_util.tree_flatten(grads_sh)
    for a, b in zip(flat_ref, flat_sh):
        scale = max(1.0, float(jnp.max(jnp.abs(a))))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=0)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gauss_sharded_train_hlo_no_pool_all_gather():
    """The lowered TRAIN-STEP gradient HLO must exchange via all-to-all and must
    not all-gather any pool-sized array (N_POOL rows or its per-feature
    packings) in forward OR backward. Image-sized collectives are fine."""
    args = _setup()
    mesh = make_mesh(gauss=8)

    def raster_fn(xyz, scales, quats, opacity, colors, bg, cam, rc,
                  mean2d_probe=None, active=None):
        return rasterize_gauss_sharded(xyz, scales, quats, opacity, colors, bg,
                                       cam, rc, mesh, mean2d_probe=mean2d_probe,
                                       active=active)

    params, gstate, probe = args[0], args[1], args[2]

    def f(params, probe):
        return forward_loss(params, gstate, probe, *args[3:11],
                            cfg=args[11], rcfg=args[12], bg_color=args[13],
                            raster_fn=raster_fn)

    with mesh:
        hlo = jax.jit(jax.grad(
            lambda p, pr: f(p, pr)[0], argnums=(0, 1)
        )).lower(params, probe).compile().as_text()

    assert "all-to-all" in hlo, "binning exchange must lower to all-to-all"
    for line in hlo.splitlines():
        if "all-gather" in line:
            assert f"{N_POOL}," not in line and f"[{N_POOL}]" not in line, (
                f"pool-sized all-gather found:\n{line}")
