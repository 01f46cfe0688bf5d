"""Render CLI: render train/test sets with all AOVs + per-image illumination maps.

TPU-native equivalent of the reference's `render.py` (`render_set`,
render.py:100-154): renders + gts + every AOV image per view, plus equirect
reconstructions of each image's environment light and sky SH. The fused renderer
produces all AOVs in one pass.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from ..config import load_config
from ..utils import envmap as EM


def save_image(path: str, arr: np.ndarray):
    """arr: [H, W, 3] or [H, W] float in [0, 1]."""
    arr = np.clip(np.asarray(arr), 0.0, 1.0)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def depth_colormap(depth: np.ndarray) -> np.ndarray:
    """Normalized turbo-free grayscale-to-viridis-ish colormap substitute for the
    reference's apply_depth_colormap (utils/image_utils.py)."""
    import matplotlib.cm as cm

    d = np.asarray(depth, np.float32)
    lo, hi = np.percentile(d, 1), np.percentile(d, 99)
    d = np.clip((d - lo) / max(hi - lo, 1e-6), 0, 1)
    return cm.get_cmap("viridis")(d)[..., :3].astype(np.float32)


def make_eval_raster_fn(rcfg):
    """Multi-device eval rendering: shard each frame's tile rows over the
    available devices (parallel.tile_parallel — a bitwise-equal decomposition).
    Returns None on a single device or when grid_y has no usable divisor."""
    n = len(jax.devices())
    if n <= 1:
        return None
    gy = rcfg.grid_y
    d = max(k for k in range(1, n + 1) if gy % k == 0)
    if d <= 1:
        return None
    from ..parallel.mesh import make_mesh
    from ..parallel.tile_parallel import make_tile_parallel_raster_fn

    mesh = make_mesh(data=d)
    print(f"render: tile-parallel over {d} devices ({gy // d} tile rows each)")
    return make_tile_parallel_raster_fn(mesh, "data")


def render_set(trainer, name: str, iteration: int, views, embeddings):
    from ..renderer import render as render_fn

    raster_fn = make_eval_raster_fn(trainer.rcfg)

    base_dir = os.path.join(trainer.model_path, name, f"iteration_{iteration}")
    dirs = {k: os.path.join(base_dir, k) for k in
            ("renders", "gts", "rendered_envlights", "rendered_sky_maps",
             "diffuse_color", "specular_color", "depth", "normal", "sky_color",
             "roughness", "metalness", "albedo")}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    cfg = trainer.cfg
    params = trainer.state.params
    mlp_vars = {"params": params["mlp"]}

    @jax.jit
    def render_view(cam, sky_mask, e):
        envl, sky_sh = trainer.mlp.apply(mlp_vars, e[None], deterministic=True)
        out = render_fn(params["gaussians"], trainer.state.gauss_state, envl[0],
                        sky_sh, cam, trainer.rcfg, trainer.bg_color, sky_mask,
                        envlight_sh_degree=cfg.model.envlight_sh_degree,
                        sky_sh_degree=cfg.model.sky_sh_degree,
                        specular=cfg.model.specular, fix_sky=cfg.model.fix_sky,
                        debug=True, raster_fn=raster_fn)
        return out, envl[0], sky_sh[0]

    for i, view in enumerate(views):
        cam = view["cam"]
        out, envl, sky_sh = render_view(cam.matrices(), jnp.asarray(view["sky_mask"]),
                                        embeddings[i])
        h, w = cam.height, cam.width
        nm = cam.image_name
        save_image(os.path.join(dirs["renders"], nm + ".png"), np.asarray(out.render)[:h, :w])
        save_image(os.path.join(dirs["gts"], nm + ".png"), view["image"][:h, :w])
        save_image(os.path.join(dirs["diffuse_color"], nm + ".png"), np.asarray(out.diffuse_color)[:h, :w])
        save_image(os.path.join(dirs["specular_color"], nm + ".png"), np.asarray(out.specular_color)[:h, :w])
        save_image(os.path.join(dirs["depth"], nm + ".png"), depth_colormap(-np.asarray(out.depth)[:h, :w]))
        save_image(os.path.join(dirs["normal"], nm + ".png"), 0.5 + 0.5 * np.asarray(out.normal)[:h, :w])
        save_image(os.path.join(dirs["sky_color"], nm + ".png"), np.asarray(out.sky_color)[:h, :w])
        save_image(os.path.join(dirs["roughness"], nm + ".png"), np.asarray(out.roughness)[:h, :w])
        save_image(os.path.join(dirs["metalness"], nm + ".png"), np.asarray(out.metalness)[:h, :w])
        save_image(os.path.join(dirs["albedo"], nm + ".png"), np.asarray(out.albedo)[:h, :w])

        # Illumination reconstructions (render_envlights_sh_all / render_sky_sh_all,
        # relit3DGW_model.py:161-215).
        np.save(os.path.join(dirs["rendered_envlights"], nm + ".npy"), np.asarray(envl))
        env_img = EM.render_sh_map(np.asarray(envl), width=600)
        from ..utils.sh import gamma_correction

        save_image(os.path.join(dirs["rendered_envlights"], nm + ".jpg"),
                   np.asarray(gamma_correction(jnp.asarray(env_img))))
        np.save(os.path.join(dirs["rendered_sky_maps"], nm + ".npy"), np.asarray(sky_sh))
        sky_img = EM.render_sh_map(np.asarray(sky_sh), width=600)
        save_image(os.path.join(dirs["rendered_sky_maps"], nm + ".jpg"),
                   np.clip(sky_img, 0, 1))
        print(f"{name} [{i + 1}/{len(views)}] {nm}")


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    skip_train = "--skip_train" in argv
    skip_test = "--skip_test" in argv
    overrides = [a for a in argv if not a.startswith("--")]
    cfg = load_config(overrides)

    from ..trainer import Relightable3DGWTrainer, pad_cameras

    trainer = Relightable3DGWTrainer(cfg)
    iteration = cfg.model.load_iteration or 0
    if iteration:
        trainer.load_checkpoint(iteration)

    if not skip_train:
        render_set(trainer, "train", iteration, trainer.train_views,
                   trainer.state.params["embeddings"])
    if not skip_test and trainer.test_cameras:
        from ..evaluation import optimize_test_embeddings

        test_views, _, _ = pad_cameras(trainer.test_cameras)
        # normal init — zeros are a dead point for the ReLU MLP (no gradient).
        emb_t = optimize_test_embeddings(
            trainer.state.params, trainer.state.gauss_state, trainer.mlp, test_views,
            cfg, trainer.rcfg,
            jax.random.normal(jax.random.PRNGKey(cfg.runtime.seed),
                              (len(test_views), cfg.model.embeddings_dim)),
        )
        render_set(trainer, "test", iteration, test_views, emb_t)


if __name__ == "__main__":
    main()
