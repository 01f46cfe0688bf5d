"""Full training-iteration timing on the real TPU: the analog of the reference's
`iter_time` TensorBoard scalar (train.py:49-50,118,195), but for ONE fused jitted
step — the reference's step runs ~10 rasterizer passes (per-AOV) plus separate
shading/loss kernels; here render + shading + loss stack + Adam are one XLA program.

Usage: python scripts/bench_train_step.py [n_gauss] [res] [iters]
Env: TRAIN_BENCH_N / TRAIN_BENCH_RES / TRAIN_BENCH_ITERS override.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(n=500_000, res=800, iters=10):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.train_step import TrainState, make_train_fns, make_optimizer
    from __graft_entry__ import _camera

    rng = np.random.RandomState(0)
    use_pallas = jax.default_backend() == "tpu"
    cam = _camera(res, res)

    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-2.5, 2.5, n),
                    rng.uniform(1.0, 10.0, n)], -1).astype(np.float32)
    capacity = ((n + 4095) // 4096) * 4096
    # knn_dist2 sized so world-space scales match bench.py's realistic tile coverage
    # (~2-6 tiles/Gaussian): scale = sqrt(knn_dist2) ~ 0.007.
    params_g, gstate = G.init_from_points(pts, np.full(n, 5e-5, np.float32), capacity)

    # Entry budget sized like bench.py: measure actual duplicates + 5% headroom.
    from relightable3dgaussians_w_tpu.ops.preprocess import preprocess
    probe_cfg = dict(width=res, height=res, tile=16)
    total = int(jax.jit(lambda m, s, q, o: jnp.sum(preprocess(
        m, s, q, cam.viewmat, cam.projmat, cam.tan_fovx, cam.tan_fovy,
        res, res, 16, opacities=o).tiles_touched))(
        params_g.xyz, jnp.exp(params_g.scaling), params_g.rotation,
        jax.nn.sigmoid(params_g.opacity)))
    max_dup = min(max(((int(total * 1.3) + 4095) // 4096) * 4096, 4096), 1 << 23)
    print(f"n={n} res={res} entries~{total} max_dup={max_dup}")

    rcfg = RasterizerConfig(width=res, height=res, max_dup=max_dup,
                            max_tiles_per_gauss=0, lmax_per_tile=4096, tile_chunk=8,
                            use_pallas=use_pallas,
                            pallas_chunk=int(os.environ.get("TRAIN_BENCH_CHUNK", 512)))
    cfg = Config()
    mlp = MLPNet()
    k = jax.random.PRNGKey(0)
    params = {"gaussians": params_g, "mlp": init_mlp(k, mlp),
              "embeddings": init_embeddings(jax.random.fold_in(k, 1), 8)}
    state = TrainState(params, gstate, make_optimizer().init(params), jnp.asarray(0))
    split = os.environ.get("TRAIN_SPLIT", "1") == "1"
    print(f"split_dispatch={split}")
    fns = make_train_fns(mlp, cfg, rcfg, split_dispatch=split)

    gt = jnp.asarray(rng.uniform(0, 1, (res, res, 3)), jnp.float32)
    sky_mask = jnp.asarray((rng.uniform(size=(res, res)) > 0.3), jnp.float32)
    occ = jnp.ones((res, res))
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(7)

    def pull(st):
        return float(jnp.sum(st.params["gaussians"].xyz[:8]))

    # warmup/compile
    state2, aux = fns.train_step(state, cam, gt, sky_mask, occ, jnp.asarray(0), key, bg)
    pull(state2)
    print(f"compiled; loss={float(aux.loss):.4f} overflow={int(aux.overflow)}")

    t0 = time.perf_counter()
    st = state
    for i in range(iters):
        st, aux = fns.train_step(st, cam, gt, sky_mask, occ, jnp.asarray(0), key, bg)
    pull(st)
    dt = (time.perf_counter() - t0) / iters
    print(f"train_step: {dt * 1e3:.2f} ms/iter  ({1.0 / dt:.2f} it/s)  "
          f"[fused render+shading+losses+adam, {n} Gaussians @ {res}x{res}]")
    return dt * 1e3


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else int(os.environ.get("TRAIN_BENCH_N", 500_000))
    res = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("TRAIN_BENCH_RES", 800))
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else int(os.environ.get("TRAIN_BENCH_ITERS", 10))
    main(n, res, iters)
