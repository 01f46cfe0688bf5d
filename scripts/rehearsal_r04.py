"""Full-protocol rehearsal at realistic scale (VERDICT r3 missing #5).

No NeRF-OSR/Trevi data exists in this environment, so the protocol numbers
cannot be produced on the real benchmark — this script is the committed,
asserted rehearsal of the ENTIRE protocol (`full_eval.py:37-59`) at a scale
the tiny CI pipeline test does not reach:

  1. builds an on-disk NeRF-OSR-layout dataset (COLMAP text + masks + splits)
     whose images are RENDERED from a known synthetic Gaussian scene with
     PER-VIEW environment lighting (the in-the-wild setting) — so there is a
     true reconstructable signal, not noise;
  2. runs the real CLI chain: train (with densification) -> render -> metrics
     -> eval with GT envmaps, through cli/full_eval.py;
  3. writes REHEARSAL_r04.json with the metric values and gates train PSNR.

Run (TPU, ~10-25 min): python scripts/rehearsal_r04.py [iters] [res]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def render_gt_views(src, res, n_views, seed=0):
    """Overwrite the dataset's placeholder images with renders of a synthetic
    GT Gaussian scene through OUR loaded cameras (guarantees convention
    consistency with what the trainer will see)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from relightable3dgaussians_w_tpu.data.readers import load_scene_info
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.renderer import render

    rng = np.random.RandomState(seed)
    n_gt, n_sky = 6000, 512
    pts = np.stack([rng.uniform(-1.2, 1.2, n_gt), rng.uniform(-1.2, 1.2, n_gt),
                    rng.uniform(-1.2, 1.2, n_gt)], -1).astype(np.float32)
    gt_params, gt_state = G.init_from_points(
        pts, np.full(n_gt, 0.003, np.float32), n_gt + n_sky)
    theta = rng.uniform(0.1, 3.0, n_sky)
    phi = rng.uniform(-np.pi, np.pi, n_sky)
    R = 25.0
    sky_pts = np.stack([R * np.sin(theta) * np.sin(phi), -R * np.cos(theta),
                        R * np.sin(theta) * np.cos(phi)], -1).astype(np.float32)
    gt_params, gt_state = G.augment_with_sky(
        gt_params, gt_state, sky_pts, np.full(n_sky, 1.5, np.float32), R,
        np.zeros(3, np.float32))
    key = jax.random.PRNGKey(1)
    gt_params = gt_params._replace(
        albedo=gt_params.albedo.at[:n_gt].set(jax.random.normal(key, (n_gt, 3))),
        opacity=gt_params.opacity.at[:n_gt].set(2.0),
    )
    envl_base = rng.uniform(0.0, 0.6, (25, 3))
    sky_gt = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4, 3)), jnp.float32)

    info = load_scene_info(src, "images", True, 1, False)
    cams = list(info.train_cameras) + list(info.test_cameras)
    rcfg = RasterizerConfig(width=res, height=res, max_dup=1 << 18,
                            max_tiles_per_gauss=0, lmax_per_tile=1024,
                            tile_chunk=8,
                            use_pallas=jax.default_backend() == "tpu")
    bg = jnp.zeros(3)
    sky_mask = jnp.ones((res, res))

    @jax.jit
    def render_one(cam_mats, envl):
        out = render(gt_params, gt_state, envl, sky_gt, cam_mats, rcfg, bg,
                     sky_mask, debug=False)
        return jnp.clip(out.render, 0, 1)

    for cam in cams:
        envl = jnp.asarray(
            envl_base + rng.uniform(-0.12, 0.12, (25, 3)), jnp.float32)
        img = np.asarray(render_one(cam.matrices(), envl))
        arr = (img[:cam.height, :cam.width] * 255).astype(np.uint8)
        name = cam.image_name + ".png"
        Image.fromarray(arr).save(os.path.join(src, "images", name))
        for split in ("train", "test"):
            p = os.path.join(src, split, "rgb", name)
            if os.path.exists(p):
                Image.fromarray(arr).save(p)
    # Seed points3D from the GT cloud (subsampled + jitter): a realistic init.
    sub = pts[rng.choice(n_gt, 800, replace=False)]
    sub = sub + rng.normal(0, 0.02, sub.shape)
    with open(os.path.join(src, "sparse/0/points3D.txt"), "w") as fh:
        fh.write("# points\n")
        for i, p in enumerate(sub):
            fh.write(f"{i+1} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 1 0\n")



def main(iters=3000, res=256):
    from PIL import Image

    from test_nerfosr_e2e import make_nerfosr_dataset

    root = os.environ.get("REHEARSAL_DIR", "/tmp/rehearsal_r04")
    scene = "lk2"
    data_root = os.path.join(root, "data")
    output = os.path.join(root, "out")
    src = os.path.join(data_root, scene)
    os.makedirs(data_root, exist_ok=True)
    make_nerfosr_dataset(src, n_train=12, n_test=2, size=res)
    render_gt_views(src, res, 14)

    rng = np.random.RandomState(9)
    env = (rng.uniform(0.2, 1.0, (32, 64, 3)) * 255).astype(np.uint8)
    env_path = os.path.join(data_root, "envmap_012.png")
    Image.fromarray(env).save(env_path)
    tc_dir = os.path.join(data_root, "test_configs", scene)
    os.makedirs(tc_dir, exist_ok=True)
    with open(os.path.join(tc_dir, "test_config.json"), "w") as f:
        json.dump({
            "img_012": {
                "env_map_path": env_path,
                "mask_path": os.path.join(src, "masks", "img_012.png"),
                "initial_env_map_rotation": {"x": -90, "y": 0, "z": 0},
                "sun_angles": [0, 360],
                "env_map_scaling": {"threshold": 0.999, "scale": 10},
            }
        }, f)

    from relightable3dgaussians_w_tpu.cli.full_eval import main as full_eval

    full_eval([
        f"--data_root={data_root}", f"--output={output}", f"--scenes={scene}",
        f"optimizer.iterations={iters}",
        "optimizer.densify_from_iter=200",
        "optimizer.densification_interval=200",
        f"optimizer.densify_until_iter={iters // 2}",
        "optimizer.opacity_reset_interval=1000000000",
        "optimizer.reg_normal_from_iter=400",
        "runtime.pool_capacity=65536",
        f"runtime.max_dup={262144 * max(res // 256, 1) ** 2}",
        "runtime.lmax_per_tile=1024", "runtime.tile_chunk=8",
        "model.init_embeddings=false", "model.init_sh_mlp=false",
    ])

    # Harvest the artifacts the protocol produces.
    mp = os.path.join(output, scene)
    summary = {"iters": iters, "res": res, "scene_dir": mp}
    with open(os.path.join(mp, "train_log.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    psnrs = [r["psnr"] for r in recs if "psnr" in r]
    summary["train_psnr_first"] = psnrs[0]
    summary["train_psnr_last"] = psnrs[-1]
    summary["train_psnr_best"] = max(psnrs)
    for cand in ("results.json", "metrics.json"):
        p = os.path.join(mp, cand)
        if os.path.exists(p):
            summary["metrics"] = json.load(open(p))
    import jax

    summary["backend"] = jax.default_backend()
    out_name = os.environ.get("REHEARSAL_OUT", "REHEARSAL_r04.json")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, default=str)
    print(f"wrote {out_name}:", json.dumps(summary, default=str)[:400])
    ok = summary["train_psnr_best"] >= 20.0
    if not ok:
        print(f"REHEARSAL FAILED: best train PSNR "
              f"{summary['train_psnr_best']:.2f} < 20")
    return 0 if ok else 1


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    sys.exit(main(iters, res))
