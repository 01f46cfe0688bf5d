"""Overflow recovery: densify overflow grows the pool (params + pool state + Adam
moments, re-jit on the host), and binning-budget overflow REJECTS the poisoned
parameter update in-graph and heals max_dup at log time.

The reference never hits either case (it resizes device buffers on the fly,
rasterizer_impl.cu:280-285, and grows torch tensors unboundedly,
gaussian_model.py:488-511); the static-shape TPU design must recover explicitly
(SURVEY.md §7 "Hard parts": correctness must degrade loudly, not silently).
"""

import json
import os

import numpy as np
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.config import Config
from test_trainer_e2e import make_dataset


def _cfg(data, out):
    cfg = Config()
    cfg.dataset.source_path = data
    cfg.dataset.model_path = out
    cfg.optimizer.densify_from_iter = 5
    cfg.optimizer.densification_interval = 10
    cfg.optimizer.opacity_reset_interval = 10_000
    cfg.optimizer.reg_normal_from_iter = 0
    cfg.runtime.max_tiles_per_gauss = 16
    cfg.runtime.lmax_per_tile = 256
    cfg.runtime.tile_chunk = 4
    return cfg


def test_densify_overflow_grows_pool(tmp_path):
    data, out = str(tmp_path / "scene"), str(tmp_path / "out")
    make_dataset(data)
    from relightable3dgaussians_w_tpu.trainer import Relightable3DGWTrainer

    cfg = _cfg(data, out)
    # Pool barely above what init needs: the first densify round must overflow.
    cfg.runtime.pool_capacity = 0
    cfg.runtime.pool_headroom = 1.25
    cfg.runtime.max_dup = 1 << 14
    # An aggressive threshold so clones/splits select many Gaussians.
    cfg.optimizer.densify_grad_threshold = 1e-12

    trainer = Relightable3DGWTrainer(cfg)
    cap0 = trainer.state.gauss_state.alive.shape[0]
    trainer.train(iterations=30, save_iterations=(), log_every=10)
    cap1 = trainer.state.gauss_state.alive.shape[0]
    assert cap1 > cap0, "pool did not grow on densify overflow"
    # Adam moments grew in lockstep with the params.
    mu_g = trainer.state.opt_state.mu["gaussians"]
    assert mu_g.xyz.shape[0] == cap1
    # Training still sane after the grow + re-jit.
    with open(trainer.log_path) as f:
        losses = [json.loads(l).get("loss", 0.0) for l in f]
    assert np.isfinite(losses).all()


def test_binning_overflow_rejects_update_and_heals(tmp_path):
    data, out = str(tmp_path / "scene"), str(tmp_path / "out")
    make_dataset(data)
    from relightable3dgaussians_w_tpu.trainer import Relightable3DGWTrainer

    cfg = _cfg(data, out)
    cfg.runtime.pool_capacity = 4096
    cfg.runtime.max_dup = 256  # far below the real entry count -> guaranteed overflow
    cfg.optimizer.densify_from_iter = 10_000  # isolate the binning path

    trainer = Relightable3DGWTrainer(cfg)
    p0 = np.asarray(trainer.state.params["gaussians"].xyz).copy()
    dup0 = trainer.rcfg.max_dup

    # One overflowing step: the update must be rejected bit-for-bit.
    view = trainer.train_views[0]
    import jax

    trainer.key, k = jax.random.split(trainer.key)
    state1, aux = trainer.fns.train_step(
        trainer.state, view["cam"].matrices(), view["image"], view["sky_mask"],
        view["occluders_mask"], jnp.asarray(view["cam"].uid), k, trainer.bg_color)
    assert int(aux.overflow) > 0
    np.testing.assert_array_equal(np.asarray(state1.params["gaussians"].xyz), p0)
    assert int(state1.step) == int(trainer.state.step) + 1

    # The training loop heals max_dup IMMEDIATELY (one step delayed, not at the
    # log boundary): with log_every far beyond the run length, after only 2
    # iterations the budget must have grown (step 1 overflowed + was rejected;
    # healing runs before step 2's dispatch) and step 2's update must have
    # landed — i.e. at most ONE rejected step per overflow event.
    trainer.train(iterations=2, save_iterations=(), log_every=100)
    assert trainer.rcfg.max_dup > dup0, "max_dup was not grown after overflow"
    p_after = np.asarray(trainer.state.params["gaussians"].xyz)
    assert np.abs(p_after - p0).max() > 0, \
        "update not applied on the first post-heal step (more than 1 rejected)"
