"""data x gauss composition artifact (VERDICT r3 item 4).

The r3 DP step serialized the camera batch with lax.scan whenever gauss > 1
(parallel/data_parallel.py r3:120-145) — on a (data=B, gauss=G) mesh the data
axis contributed storage but no compute concurrency. The r4 fused step runs the
complete per-camera loss+backward inside ONE shard_map over BOTH axes, so each
data row renders its own camera while the pool stays gauss-sharded.

Evidence recorded here (virtual CPU mesh):
  * the compiled HLO of the fused step contains NO B-length sequential loop
    over cameras: the flattened per-device program is the SAME SIZE for
    B in {1, 2, 4} (each device executes one camera's computation), where the
    r3 scan grew a while-loop trip count with B;
  * wall-clock per step vs B (CPU-contended: honest trend only, the 8
    "devices" share host cores).

Run: python scripts/compose_r04.py   (writes COMPOSE_r04.json)
"""

import json
import os
import re
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def setup(data_ax, gauss_ax, H=64, W=64, cap=1024):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
    from relightable3dgaussians_w_tpu.parallel.data_parallel import (
        CameraBatch, make_dp_train_step, shard_train_state)
    from relightable3dgaussians_w_tpu.train_step import TrainState, make_optimizer
    from __graft_entry__ import _synthetic_scene, _camera

    cfg = Config()
    cfg.optimizer.reg_normal_from_iter = 0
    params_g, gstate = _synthetic_scene(n=cap * 3 // 4, n_sky=cap // 8, cap=cap)
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    key = jax.random.PRNGKey(0)
    params = {"gaussians": params_g, "mlp": init_mlp(key, mlp),
              "embeddings": init_embeddings(jax.random.fold_in(key, 1),
                                            max(data_ax, 1))}
    state = TrainState(params, gstate, make_optimizer().init(params),
                       jnp.asarray(0))
    rcfg = RasterizerConfig(width=W, height=H, max_dup=1 << 14,
                            max_tiles_per_gauss=16, lmax_per_tile=256,
                            tile_chunk=2)
    mesh = make_mesh(data=data_ax, gauss=gauss_ax)
    B = data_ax
    cam = _camera(W, H)
    rng = np.random.RandomState(0)
    batch = CameraBatch(
        viewmat=jnp.stack([cam.viewmat] * B),
        projmat=jnp.stack([cam.projmat] * B),
        campos=jnp.stack([cam.campos] * B),
        tan_fovx=jnp.stack([jnp.asarray(cam.tan_fovx)] * B),
        tan_fovy=jnp.stack([jnp.asarray(cam.tan_fovy)] * B),
        gt_image=jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32),
        sky_mask=jnp.ones((B, H, W), jnp.float32),
        occluders_mask=jnp.ones((B, H, W), jnp.float32),
        uid=jnp.arange(B) % max(data_ax, 1))
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    bg = jnp.zeros(3, jnp.float32)
    with mesh:
        state = shard_train_state(state, mesh)
        step = make_dp_train_step(mlp, cfg, rcfg, mesh)
    return mesh, step, state, batch, keys, bg


def main():
    results = []
    for data_ax in (1, 2, 4):
        gauss_ax = 2
        mesh, step, state, batch, keys, bg = setup(data_ax, gauss_ax)
        with mesh:
            txt = step.lower(state, batch, keys, bg).compile().as_text()
            n_while = txt.count(" while(")
            n_lines = len(txt.splitlines())
            t0 = time.perf_counter()
            s, m = step(state, batch, keys, bg)
            loss = float(m["loss"])
            compile_s = time.perf_counter() - t0
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                s, m = step(s, batch, keys, bg)
            float(m["loss"])
            dt = (time.perf_counter() - t0) / iters
        results.append(dict(data=data_ax, gauss=gauss_ax, B=data_ax,
                            step_ms=dt * 1e3, loss=loss,
                            hlo_while_ops=n_while, hlo_lines=n_lines))
        print(results[-1])

    # Program size must NOT grow with B (per-device program = one camera).
    lines = [r["hlo_lines"] for r in results]
    flat = max(lines) / max(min(lines), 1)
    out = dict(
        kind="data_x_gauss_composition",
        note=("fused shard_map over (data, gauss): per-device HLO is one "
              "camera's computation regardless of B — compare hlo_lines across "
              "rows (r3's lax.scan grew a B-trip while loop instead); step_ms "
              "on the CPU-contended virtual mesh is a trend, not throughput"),
        hlo_size_ratio_maxB_over_minB=flat,
        results=results)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "COMPOSE_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote COMPOSE_r04.json; hlo size ratio", flat)


if __name__ == "__main__":
    main()
