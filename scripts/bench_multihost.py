"""Multi-host overhead measurement: the SAME 8-device (data=4, gauss=2) mesh
run as 1 process x 8 devices vs 2 processes x 4 devices (gloo between them).

Real multi-chip hardware has one host; this CPU-cluster A/B isolates exactly
the thing multi-host adds — the cross-process boundary in the collectives
(all_to_all across the gauss axis now crosses gloo, the analog of DCN) and the
global-array feeding path — with device count, mesh, scene, and schedule held
fixed. The caveat of SCALING_r04 applies: virtual CPU devices share host
cores, so absolute ms is contention-bound; the RATIO is the signal.

Writes MULTIHOST_SCALING_r05.json. Run: python scripts/bench_multihost.py
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys, json, time
pid, nproc, dev_per_proc, port, out_path = (
    int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
    sys.argv[5])
os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={dev_per_proc}"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tests")
from types import SimpleNamespace
from relightable3dgaussians_w_tpu.parallel import multihost
if nproc > 1:
    multihost.maybe_initialize(SimpleNamespace(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
        process_id=pid))
import numpy as np
import jax.numpy as jnp
from relightable3dgaussians_w_tpu.config import Config
from relightable3dgaussians_w_tpu.models import gaussians as G
from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
from relightable3dgaussians_w_tpu.parallel.data_parallel import (
    CameraBatch, make_dp_train_step, shard_train_state)
from relightable3dgaussians_w_tpu.train_step import TrainState, make_optimizer
from __graft_entry__ import _camera, _synthetic_scene

assert jax.device_count() == 8, jax.device_count()
mesh = make_mesh(data=4, gauss=2)
W, H, B = 64, 64, 4
cfg = Config(); cfg.optimizer.reg_normal_from_iter = 0
params_g, gstate = _synthetic_scene(n=960, n_sky=64, cap=2048)
mlp = MLPNet()
key = jax.random.PRNGKey(0)
params = {"gaussians": params_g, "mlp": init_mlp(key, mlp),
          "embeddings": init_embeddings(jax.random.fold_in(key, 1), B)}
state = TrainState(params, gstate, make_optimizer().init(params), jnp.asarray(0))
rcfg = RasterizerConfig(width=W, height=H, max_dup=1 << 13,
                        max_tiles_per_gauss=16, lmax_per_tile=128, tile_chunk=2)
with mesh:
    state = shard_train_state(state, mesh)
    step = make_dp_train_step(mlp, cfg, rcfg, mesh)
    cams = [_camera(W, H) for _ in range(B)]
    rng = np.random.RandomState(0)
    batch_np = CameraBatch(
        viewmat=np.stack([np.asarray(c.viewmat) for c in cams]),
        projmat=np.stack([np.asarray(c.projmat) for c in cams]),
        campos=np.stack([np.asarray(c.campos) for c in cams]),
        tan_fovx=np.stack([np.asarray(c.tan_fovx) for c in cams]),
        tan_fovy=np.stack([np.asarray(c.tan_fovy) for c in cams]),
        gt_image=rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32),
        sky_mask=np.ones((B, H, W), np.float32),
        occluders_mask=np.ones((B, H, W), np.float32),
        uid=np.arange(B),
    )
    keys_np = np.asarray(jax.random.split(jax.random.PRNGKey(7), B))
    bg_np = np.zeros(3, np.float32)
    from jax.sharding import PartitionSpec as P
    if nproc > 1:
        batch = multihost.global_batch(batch_np, mesh, lambda a: P("data"))
        keys = multihost.global_batch(keys_np, mesh, lambda a: P("data"))
        bg = multihost.global_batch(bg_np, mesh)
    else:
        batch, keys, bg = batch_np, jnp.asarray(keys_np), jnp.asarray(bg_np)
    t0 = time.time()
    state, metrics = step(state, batch, keys, bg)
    compile_s = time.time() - t0
    float(metrics["loss"])
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        state, metrics = step(state, batch, keys, bg)
    loss = float(metrics["loss"])
    step_ms = (time.time() - t0) / iters * 1e3
if pid == 0:
    with open(out_path, "w") as f:
        json.dump({"step_ms": step_ms, "compile_s": compile_s, "loss": loss},
                  f)
print(f"[p{pid}] step_ms={step_ms:.1f} loss={loss:.4f}", flush=True)
'''


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def run_config(nproc, dev_per_proc):
    with tempfile.TemporaryDirectory() as td:
        worker = os.path.join(td, "w.py")
        with open(worker, "w") as f:
            f.write(WORKER % {"repo": REPO})
        out_path = os.path.join(td, "out.json")
        port = free_port()
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, worker, str(p), str(nproc), str(dev_per_proc),
             str(port), out_path], env=env) for p in range(nproc)]
        for p in procs:
            rc = p.wait(timeout=1200)
            assert rc == 0, rc
        with open(out_path) as f:
            return json.load(f)


def main():
    res1 = run_config(1, 8)
    print("1 process x 8 devices:", res1, flush=True)
    res2 = run_config(2, 4)
    print("2 processes x 4 devices:", res2, flush=True)
    assert abs(res1["loss"] - res2["loss"]) < 1e-4, (res1["loss"], res2["loss"])
    out = {
        "kind": "multihost_overhead_same_mesh",
        "mesh": "data=4 x gauss=2 (8 CPU devices)",
        "single_process": res1,
        "two_process_gloo": res2,
        "overhead_pct": round(
            100.0 * (res2["step_ms"] / res1["step_ms"] - 1.0), 1),
        "loss_match": True,
        "caveat": ("virtual CPU devices share host cores; absolute ms is "
                   "contention-bound, the 1-proc vs 2-proc RATIO isolates the "
                   "cross-process (gloo/DCN-analog) collective boundary and "
                   "global-array feeding overhead at fixed mesh/scene"),
    }
    path = os.path.join(REPO, "MULTIHOST_SCALING_r05.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
