"""Viewer-driven serving demo (VERDICT r4 item 4): drive the REAL network viewer
(`viewer.ViewerServer`, json protocol) with a client that sweeps the camera, and
measure end-to-end frame latency — socket receive -> jitted `render_rgb` ->
socket send — at bench-comparable scale (1M Gaussians, 800^2 by default).

The reference's analog is live SIBR viewing through network_gui.py; here the
client pauses "training" (train=False) so the server loop serves continuously,
exactly the stock GUI pause semantics (viewer.handle_viewer_request).

Run: python scripts/serve_demo.py [n=1000000] [res=800] [frames=30]
Env: SERVE_SKIP_ALPHA (default 1/255 = exact; e.g. 0.0156 for the 1/64 LOD),
     SERVE_OUT (default SERVE_DEMO_r05.json at repo root).
"""

import json
import os
import socket
import struct
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _yaw(deg):
    a = np.deg2rad(deg)
    view = np.eye(4, dtype=np.float32)
    view[0, 0] = np.cos(a)
    view[0, 2] = np.sin(a)
    view[2, 0] = -np.sin(a)
    view[2, 2] = np.cos(a)
    return view


def _build_shim(n, W, H, skip_alpha):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _camera, _synthetic_scene
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models.nets import (
        MLPNet, init_embeddings, init_mlp)
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.train_step import TrainState

    cfg = Config()
    cfg.runtime.serve_skip_alpha = skip_alpha
    cfg.runtime.serve_packed_rgb = os.environ.get("SERVE_PACKED", "0") == "1"
    # Density-consistent init scales (mean 3-NN d2 ~ (V/n)^(2/3), anchored to
    # the 0.008 hand-pick at 10k points): at 1M points this lands splat
    # coverage in the same ~2-6 tiles/Gaussian regime as bench.py's scene.
    d2 = 0.008 * (10_000 / n) ** (2.0 / 3.0)
    params_g, gstate = _synthetic_scene(n=n, n_sky=max(n // 100, 500), d2=d2)
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    key = jax.random.PRNGKey(0)
    params = {"gaussians": params_g, "mlp": init_mlp(key, mlp),
              "embeddings": init_embeddings(jax.random.fold_in(key, 1), 4)}

    # Demand-size the static entry budget over the sweep extremes (sort/gather
    # costs scale with the STATIC budget — bench.py build() policy).
    from relightable3dgaussians_w_tpu.models import gaussians as G
    xyz = G.get_xyz(params_g, gstate)
    scl = G.get_scaling(params_g)
    quat = G.get_rotation(params_g)
    opa = (G.get_opacity(params_g, gstate)[:, 0]
           * gstate.alive.astype(jnp.float32))
    cam0 = _camera(W, H)

    def count(viewmat):
        vm = jnp.asarray(viewmat)
        pm = jnp.asarray(np.asarray(cam0.projmat) @ viewmat)
        pre = preprocess(xyz, scl, quat, vm, pm, cam0.tan_fovx, cam0.tan_fovy,
                         W, H, 16, opacities=opa, skip_alpha=skip_alpha)
        return jnp.sum(pre.tiles_touched)

    cj = jax.jit(count)
    demand = max(int(cj(_yaw(d))) for d in (-10.0, 0.0, 10.0))
    max_dup = min(max(((int(demand * 1.10) + 4095) // 4096) * 4096, 4096), 1 << 23)

    rcfg = RasterizerConfig(
        width=W, height=H, max_dup=max_dup, max_tiles_per_gauss=16,
        lmax_per_tile=4096, tile_chunk=8,
        use_pallas=jax.default_backend() == "tpu", pallas_chunk=512,
        skip_alpha=skip_alpha)

    class Shim:
        pass

    shim = Shim()
    shim.W, shim.H = W, H
    shim.rcfg = rcfg
    shim.cfg = cfg
    shim.mlp = mlp
    shim.bg_color = jnp.zeros(3, jnp.float32)
    # Serving holds no optimizer state (opt_state=None): frames touch only
    # params + gauss_state (_serve_frame), so a 1M pool fits comfortably.
    shim.state = TrainState(params, gstate, None, jnp.asarray(0))
    return shim, cam0, max_dup


def _client(port, cam0, W, H, frames, timings, done):
    sock = socket.create_connection(("127.0.0.1", port), timeout=300)
    fovx = 2 * float(np.arctan(float(cam0.tan_fovx)))
    try:
        for i in range(frames):
            deg = -10.0 + 20.0 * i / max(frames - 1, 1)
            req = json.dumps({
                "viewmat": _yaw(deg).tolist(), "fovx": fovx, "fovy": fovx,
                "width": W, "height": H, "train": False,
                "fix_sky": False, "embedding_index": 0,
            }).encode()
            t0 = time.perf_counter()
            sock.sendall(struct.pack("<I", len(req)) + req)
            (ln,) = struct.unpack("<I", _recv(sock, 4))
            buf = _recv(sock, ln)
            timings.append((time.perf_counter() - t0, len(buf)))
    finally:
        sock.close()
        done.set()


def _recv(sock, n):
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("server closed")
        out += chunk
    return out


def main(n=1_000_000, res=800, frames=30):
    import jax

    if os.environ.get("SERVE_CPU", "0") == "1":
        # The axon tunnel ignores JAX_PLATFORMS from the env; force CPU the
        # supported way (CLAUDE.md) for smoke runs that must not touch the TPU.
        jax.config.update("jax_platforms", "cpu")

    from relightable3dgaussians_w_tpu.viewer import (
        ViewerServer, handle_viewer_request)

    skip_alpha = float(os.environ.get("SERVE_SKIP_ALPHA", 1.0 / 255.0))
    W = H = res
    t0 = time.time()
    shim, cam0, max_dup = _build_shim(n, W, H, skip_alpha)
    build_s = time.time() - t0

    server = ViewerServer(port=0, protocol="json")
    timings, done = [], threading.Event()
    t = threading.Thread(target=_client,
                         args=(server.port, cam0, W, H, frames, timings, done),
                         daemon=True)
    t.start()
    t0 = time.time()
    while not done.is_set() and time.time() - t0 < 600:
        handle_viewer_request(server, shim)
        time.sleep(0.001)
    t.join(timeout=10)
    server.close_conn()
    assert len(timings) == frames, f"served {len(timings)}/{frames} frames"
    assert all(ln == W * H * 3 for _, ln in timings)

    # Device-only frame time (scalar pull, scripts/tputime.py pattern): under
    # the axon tunnel the full-frame pull costs ~1.4 s / 64 MB, an environment
    # artifact a real TPU host (PCIe) does not have — report both.
    import jax.numpy as jnp

    from relightable3dgaussians_w_tpu.viewer import _jitted_frame_fn

    rcfg_srv = shim.rcfg._replace(scale_modifier=1.0, row_intervals=False,
                                  skip_alpha=skip_alpha,
                                  packed_rgb=shim.cfg.runtime.serve_packed_rgb)
    fn = _jitted_frame_fn(rcfg_srv, shim.cfg.model.envlight_sh_degree,
                          shim.cfg.model.sky_sh_degree, shim.cfg.model.specular,
                          False)
    e = shim.state.params["embeddings"][0][None]
    envl, sky_sh = shim.mlp.apply({"params": shim.state.params["mlp"]}, e,
                                  deterministic=True)
    fargs = (shim.state.params["gaussians"], shim.state.gauss_state, envl[0],
             sky_sh, cam0, shim.bg_color)
    float(jnp.sum(fn(*fargs).astype(jnp.float32)))   # warm (cache-hit) frame
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out_u8 = fn(*fargs)
    float(jnp.sum(out_u8.astype(jnp.float32)))
    device_ms = (time.perf_counter() - t0) / reps * 1e3

    # Frame 0 includes the jit compile; steady state is the serving number.
    steady = [ms * 1e3 for ms, _ in timings[1:]]
    out = {
        "kind": "viewer_serving_demo",
        "protocol": "json (length-prefixed; SIBR wire also supported)",
        "n_gaussians": n, "resolution": [W, H], "frames": frames,
        "skip_alpha": skip_alpha, "max_dup": max_dup,
        "packed_rgb": shim.cfg.runtime.serve_packed_rgb,
        "backend": jax.default_backend(),
        "build_s": round(build_s, 1),
        "first_frame_ms_incl_compile": round(timings[0][0] * 1e3, 1),
        "steady_ms_per_frame_mean": round(float(np.mean(steady)), 2),
        "steady_ms_per_frame_p50": round(float(np.median(steady)), 2),
        "steady_fps": round(1e3 / float(np.mean(steady)), 1),
        "device_render_ms": round(device_ms, 2),
        "device_fps": round(1e3 / device_ms, 1),
        "note": ("end-to-end: socket receive -> jitted render_rgb (3-channel "
                 "serving path) -> uint8 convert -> socket send, camera "
                 "sweeping -10..10 deg yaw; overflow-free budget sized over "
                 "the sweep extremes"),
    }
    name = os.environ.get("SERVE_OUT", "SERVE_DEMO_r05.json")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    sys.exit(main(n, res, frames))
