"""Weak-scaling artifact for the gauss-sharded TRAIN step (VERDICT r3 item 5).

Fixed per-device pool (weak scaling) over gauss in {1, 2, 4, 8} on the virtual
CPU mesh: each configuration runs the FULL dp train step (render via
tile-ownership all-to-all when gauss > 1, loss stack, per-image grads, Adam
microsteps) with pool = gauss * POOL_PER_DEV rows and one camera. Reports
step time and the collective bytes found in the compiled HLO.

HONEST CAVEAT (recorded into the artifact): the 8 "devices" are XLA host
threads on shared CPU cores, so wall-clock contends for the same silicon —
step times measure collective/orchestration OVERHEAD trends, not real-chip
throughput; collective byte counts are exact.

Run: python scripts/scaling_r04.py   (writes SCALING_r04.json)
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

POOL_PER_DEV = 512
W, H = 32, 128  # grid_y = 8: divisible by every gauss axis tested


def setup(gauss):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
    from relightable3dgaussians_w_tpu.parallel.data_parallel import (
        CameraBatch, make_dp_train_step, shard_train_state)
    from relightable3dgaussians_w_tpu.train_step import TrainState, make_optimizer
    from __graft_entry__ import _synthetic_scene, _camera

    cap = POOL_PER_DEV * gauss
    cfg = Config()
    cfg.optimizer.reg_normal_from_iter = 0
    params_g, gstate = _synthetic_scene(n=cap * 3 // 4, n_sky=cap // 8, cap=cap)
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    key = jax.random.PRNGKey(0)
    params = {"gaussians": params_g, "mlp": init_mlp(key, mlp),
              "embeddings": init_embeddings(jax.random.fold_in(key, 1), 1)}
    opt_state = make_optimizer().init(params)
    state = TrainState(params, gstate, opt_state, jnp.asarray(0))
    rcfg = RasterizerConfig(width=W, height=H, max_dup=1 << 14,
                            max_tiles_per_gauss=16, lmax_per_tile=256,
                            tile_chunk=2)
    mesh = make_mesh(data=1, gauss=gauss)
    with mesh:
        state = shard_train_state(state, mesh)
        step = make_dp_train_step(mlp, cfg, rcfg, mesh)
        cam = _camera(W, H)
        rng = np.random.RandomState(0)
        batch = CameraBatch(
            viewmat=cam.viewmat[None], projmat=cam.projmat[None],
            campos=cam.campos[None], tan_fovx=jnp.asarray([cam.tan_fovx]),
            tan_fovy=jnp.asarray([cam.tan_fovy]),
            gt_image=jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), jnp.float32),
            sky_mask=jnp.ones((1, H, W), jnp.float32),
            occluders_mask=jnp.ones((1, H, W), jnp.float32),
            uid=jnp.zeros((1,), jnp.int32))
        keys = jax.random.split(jax.random.PRNGKey(7), 1)
        bg = jnp.zeros(3, jnp.float32)
    return mesh, step, state, batch, keys, bg


DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f16": 2, "bf16": 2, "pred": 1,
               "s8": 1, "u8": 1, "c64": 8, "f64": 8}


def collective_bytes(step, state, batch, keys, bg):
    """Count collective ops and their output bytes in the compiled HLO."""
    txt = step.lower(state, batch, keys, bg).compile().as_text()
    out = {}
    pat = re.compile(r"= (\w+)\[([\d,]*)\]\S* ("
                     r"all-to-all|all-gather|all-reduce|collective-permute|"
                     r"reduce-scatter)(?:-start)?\(")
    for m in pat.finditer(txt):
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        rec = out.setdefault(kind, dict(ops=0, bytes=0))
        rec["ops"] += 1
        rec["bytes"] += n * DTYPE_BYTES.get(dt, 4)
    return out


def main():
    results = []
    for gauss in (1, 2, 4, 8):
        mesh, step, state, batch, keys, bg = setup(gauss)
        with mesh:
            t0 = time.perf_counter()
            new_state, metrics = step(state, batch, keys, bg)
            loss = float(metrics["loss"])
            compile_s = time.perf_counter() - t0
            iters = 10
            # re-run: state was donated; use new_state alternately
            s = new_state
            t0 = time.perf_counter()
            for _ in range(iters):
                s, metrics = step(s, batch, keys, bg)
            float(metrics["loss"])
            dt = (time.perf_counter() - t0) / iters
            try:
                colls = collective_bytes(step, state, batch, keys, bg)
            except Exception as e:
                colls = {"error": str(e)[:120]}
        results.append(dict(gauss=gauss, pool=POOL_PER_DEV * gauss,
                            pool_per_device=POOL_PER_DEV,
                            step_ms=dt * 1e3, compile_s=compile_s, loss=loss,
                            collective_ops=colls))
        print(results[-1])
    out = dict(
        kind="weak_scaling_gauss_sharded_train_step",
        pool_per_device=POOL_PER_DEV, image=[H, W],
        caveat=("virtual CPU mesh: 8 'devices' share host cores, so step_ms "
                "measures collective/orchestration overhead trends under "
                "contention, NOT real-chip throughput; collective op counts "
                "are exact properties of the compiled program"),
        results=results)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SCALING_r04.json")


if __name__ == "__main__":
    main()
