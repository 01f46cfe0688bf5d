"""Multi-chip scaling-efficiency harness: data-parallel training throughput at
1..N devices (BASELINE.md target: >=80% multi-host efficiency).

On a pod slice this measures real ICI-scaled throughput; on this single-chip dev box
it runs the same code over virtual CPU devices to validate the harness:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu" or os.environ.get("SCALING_CPU"):
    # The axon TPU plugin ignores the JAX_PLATFORMS env var (CLAUDE.md); force it.
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def run(n_gauss=20_000, res=128, iters=10):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
    from relightable3dgaussians_w_tpu.parallel.data_parallel import (
        CameraBatch, make_dp_train_step, shard_train_state,
    )
    from relightable3dgaussians_w_tpu.train_step import TrainState, make_optimizer
    from __graft_entry__ import _synthetic_scene, _camera

    n_dev_total = len(jax.devices())
    cfg = Config()
    cfg.optimizer.reg_normal_from_iter = 0
    rng = np.random.RandomState(0)
    results = {}
    base = None
    n = 1
    while n <= n_dev_total:
        params_g, gstate = _synthetic_scene(n=n_gauss, n_sky=512,
                                            cap=int(n_gauss * 1.3))
        mlp = MLPNet()
        k = jax.random.PRNGKey(0)
        params = {"gaussians": params_g, "mlp": init_mlp(k, mlp),
                  "embeddings": init_embeddings(jax.random.fold_in(k, 1), n)}
        state = TrainState(params, gstate, make_optimizer().init(params), jnp.asarray(0))
        use_pallas = jax.default_backend() == "tpu"
        rcfg = RasterizerConfig(width=res, height=res, max_dup=1 << 16,
                                lmax_per_tile=512, tile_chunk=8, use_pallas=use_pallas)
        mesh = make_mesh(data=n, gauss=1)
        with mesh:
            state = shard_train_state(state, mesh)
            step = make_dp_train_step(mlp, cfg, rcfg, mesh)
            cams = [_camera(res, res) for _ in range(n)]
            batch = CameraBatch(
                viewmat=jnp.stack([c.viewmat for c in cams]),
                projmat=jnp.stack([c.projmat for c in cams]),
                campos=jnp.stack([c.campos for c in cams]),
                tan_fovx=jnp.stack([c.tan_fovx for c in cams]),
                tan_fovy=jnp.stack([c.tan_fovy for c in cams]),
                gt_image=jnp.asarray(rng.uniform(0, 1, (n, res, res, 3)), jnp.float32),
                sky_mask=jnp.ones((n, res, res), jnp.float32),
                occluders_mask=jnp.ones((n, res, res), jnp.float32),
                uid=jnp.arange(n),
            )
            keys = jax.random.split(jax.random.PRNGKey(1), n)
            bg = jnp.zeros(3)
            state, m = step(state, batch, keys, bg)
            jax.block_until_ready(m["loss"])
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = step(state, batch, keys, bg)
            jax.block_until_ready(m["loss"])
            dt = (time.perf_counter() - t0) / iters
        images_s = n / dt
        if base is None:
            base = images_s
        eff = images_s / (base * n)
        results[n] = {"images_per_s": images_s, "efficiency": eff}
        print(f"devices={n}: {images_s:.2f} images/s, scaling efficiency {eff:.1%}")
        n *= 2
    print(json.dumps({"scaling": results}))
    return results


if __name__ == "__main__":
    run()
