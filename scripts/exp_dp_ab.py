"""Data-parallel semantics A/B: B-image Adam steps vs the reference's per-image step.

The reference trains one image per optimizer step (train.py:55-80). B-way data
parallelism (parallel/data_parallel.py) applies ONE Adam step per B images with
mean gradients — the standard large-batch trade, but until now untested for its
effect on the training TRAJECTORY (VERDICT r1, weak #6). This experiment trains the
same synthetic multi-view scene (selfcheck_train.py scene family, densification off
to isolate optimizer semantics) two ways with identical view order and init:

  A: single-device, one Adam step per image          (reference semantics)
  B: data=B virtual-CPU mesh, one step per B images  (DP semantics)

and records the mean train-view PSNR trajectory of each on the same image-count
axis. Writes DP_AB_r03.json; exits 1 if the final PSNRs diverge by more than
$DPAB_MAX_DIVERGENCE dB (default 1.5 — large-batch lag at this tiny scale is
expected, a multiple of it indicates broken DP gradients/stats).

Run: python scripts/exp_dp_ab.py [images=1024] [res=96] [B=4]
"""

import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def build_scene(res, n_views, rng):
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig, CameraMatrices
    from relightable3dgaussians_w_tpu.renderer import render
    from relightable3dgaussians_w_tpu.utils.graphics import projection_matrix

    rcfg = RasterizerConfig(width=res, height=res, max_dup=1 << 15,
                            max_tiles_per_gauss=0, lmax_per_tile=512, tile_chunk=8)
    n_gt = 1500
    pts = np.stack([rng.uniform(-1.5, 1.5, n_gt), rng.uniform(-1.5, 1.5, n_gt),
                    rng.uniform(2.0, 6.0, n_gt)], -1).astype(np.float32)
    gt_params, gt_state = G.init_from_points(pts, np.full(n_gt, 0.004, np.float32), n_gt)
    key = jax.random.PRNGKey(1)
    gt_params = gt_params._replace(
        albedo=gt_params.albedo.at[:].set(jax.random.normal(key, (n_gt, 3))),
        opacity=gt_params.opacity.at[:].set(2.0),
    )
    envl_base = rng.uniform(0.0, 0.6, (25, 3))
    envl_gts = [jnp.asarray(envl_base + rng.uniform(-0.1, 0.1, (25, 3)), jnp.float32)
                for _ in range(n_views)]
    sky_gt = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4, 3)), jnp.float32)

    def make_cam(angle):
        fov = np.deg2rad(60)
        c = np.array([4.0 * np.sin(angle), 0.0, 4.0 - 4.0 * np.cos(angle)])
        fwd = np.array([0, 0, 4.0]) - c
        fwd /= np.linalg.norm(fwd)
        right = np.cross([0, 1, 0], fwd); right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.stack([right, up, fwd], 0)
        w2c[:3, 3] = -w2c[:3, :3] @ c
        proj = projection_matrix(0.01, 100.0, fov, fov)
        return CameraMatrices(
            viewmat=jnp.asarray(w2c), projmat=jnp.asarray(proj @ w2c),
            campos=jnp.asarray(c, jnp.float32),
            tan_fovx=jnp.float32(np.tan(fov / 2)),
            tan_fovy=jnp.float32(np.tan(fov / 2)))

    cams = [make_cam(a) for a in np.linspace(-0.5, 0.5, n_views)]
    bg = jnp.zeros(3)
    sky_mask = jnp.ones((res, res))

    @jax.jit
    def render_gt(cam, envl_gt):
        out = render(gt_params, gt_state, envl_gt, sky_gt, cam, rcfg, bg, sky_mask,
                     debug=False)
        return jnp.clip(out.render, 0, 1)

    gts = [render_gt(c, e) for c, e in zip(cams, envl_gts)]
    return rcfg, cams, gts, bg, sky_mask


def fresh_student(rng, n_views, cap=4096):
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.train_step import TrainState, make_optimizer

    n0 = 1500
    pts0 = np.stack([rng.uniform(-1.5, 1.5, n0), rng.uniform(-1.5, 1.5, n0),
                     rng.uniform(2.0, 6.0, n0)], -1).astype(np.float32)
    params_g, gstate = G.init_from_points(pts0, np.full(n0, 4e-4, np.float32), cap)
    mlp = MLPNet()
    k = jax.random.PRNGKey(0)
    params = {"gaussians": params_g, "mlp": init_mlp(k, mlp),
              "embeddings": init_embeddings(jax.random.fold_in(k, 1), n_views)}
    return mlp, TrainState(params, gstate, make_optimizer().init(params), jnp.asarray(0))


def main(images=1024, res=96, B=4, eval_every=128):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.train_step import make_train_fns, forward_loss
    from relightable3dgaussians_w_tpu.parallel.mesh import make_mesh
    from relightable3dgaussians_w_tpu.parallel.data_parallel import (
        CameraBatch, make_dp_train_step, shard_train_state)

    n_views = 8
    rng = np.random.RandomState(0)
    rcfg, cams, gts, bg, sky_mask = build_scene(res, n_views, rng)
    occ = jnp.ones((res, res))
    cfg = Config()
    cfg.optimizer.reg_normal_from_iter = 10**9
    cfg.optimizer.densify_from_iter = 10**9   # isolate optimizer semantics

    # Identical pre-generated view order and per-step keys for both arms.
    order = [int(x) for x in np.random.RandomState(3).randint(n_views, size=images)]
    keys = jax.random.split(jax.random.PRNGKey(7), images)

    def eval_psnr(mlp, state):
        ps = []
        for vi in range(n_views):
            probe = jnp.zeros((state.gauss_state.alive.shape[0], 2))
            _, aux = forward_loss(state.params, state.gauss_state, probe, mlp,
                                  cams[vi], gts[vi], sky_mask, occ, jnp.asarray(vi),
                                  jax.random.PRNGKey(0), state.step, cfg, rcfg, bg)
            ps.append(float(aux["psnr"]))
        return float(np.mean(ps))

    # ---- arm A: per-image steps (reference semantics)
    rng_a = np.random.RandomState(1)
    mlp, state = fresh_student(rng_a, n_views)
    fns = make_train_fns(mlp, cfg, rcfg, split_dispatch=False)
    traj_a = []
    for i in range(images):
        vi = order[i]
        state, aux = fns.train_step(state, cams[vi], gts[vi], sky_mask, occ,
                                    jnp.asarray(vi), keys[i], bg)
        if (i + 1) % eval_every == 0:
            p = eval_psnr(mlp, state)
            traj_a.append((i + 1, p))
            print(f"A [{i+1} imgs] psnr={p:.2f}", flush=True)

    # ---- arm B: B-image DP steps on a virtual mesh (same init, order, keys)
    mesh = make_mesh(data=B, gauss=1)
    rng_b = np.random.RandomState(1)
    mlp_b, state_b = fresh_student(rng_b, n_views)
    state_b = shard_train_state(state_b, mesh)
    dp_step = make_dp_train_step(mlp_b, cfg, rcfg, mesh)
    traj_b = []
    H = W = res
    for s in range(images // B):
        idx = order[s * B:(s + 1) * B]
        batch = CameraBatch(
            viewmat=jnp.stack([cams[v].viewmat for v in idx]),
            projmat=jnp.stack([cams[v].projmat for v in idx]),
            campos=jnp.stack([cams[v].campos for v in idx]),
            tan_fovx=jnp.stack([cams[v].tan_fovx for v in idx]),
            tan_fovy=jnp.stack([cams[v].tan_fovy for v in idx]),
            gt_image=jnp.stack([gts[v] for v in idx]),
            sky_mask=jnp.broadcast_to(sky_mask, (B, H, W)),
            occluders_mask=jnp.broadcast_to(occ, (B, H, W)),
            uid=jnp.asarray(idx),
        )
        state_b, _ = dp_step(state_b, batch, keys[s * B:(s + 1) * B], bg)
        seen = (s + 1) * B
        if seen % eval_every == 0:
            p = eval_psnr(mlp_b, state_b)
            traj_b.append((seen, p))
            print(f"B [{seen} imgs] psnr={p:.2f}", flush=True)

    final_a, final_b = traj_a[-1][1], traj_b[-1][1]
    div = abs(final_a - final_b)
    out = {
        "config": {"images": images, "res": res, "B": B, "n_views": n_views,
                   "densification": False,
                   "note": "arm A: one Adam step/image (reference train.py:55-80); "
                           "arm B: B parallel per-image grads + B sequential Adam "
                           "microsteps per DP step (parallel/data_parallel.py). "
                           "Same init/order/keys."},
        "trajectory_per_image_step": traj_a,
        "trajectory_dp": traj_b,
        "final_psnr": {"per_image": final_a, "dp": final_b, "divergence_db": div},
    }
    path = os.environ.get("DPAB_OUT", "DP_AB_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["final_psnr"]))
    max_div = float(os.environ.get("DPAB_MAX_DIVERGENCE", 1.5))
    if div > max_div:
        print(f"DP A/B FAILED: trajectories diverge {div:.2f} dB > {max_div}")
        return 1
    return 0


if __name__ == "__main__":
    images = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sys.exit(main(images, res, B))
