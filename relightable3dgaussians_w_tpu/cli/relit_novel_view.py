"""Relight a trained scene with an external environment map from a chosen view,
optionally sweeping the sun over a rotation sequence into a video.

TPU-native equivalent of the reference's `relit_novel_view.py:77-159`: envmap from
.exr/.jpg/.png (or a learned .npy SH file), projected to SH deg 4, rendered with
fix_sky, plus an N-step rotation sweep saved as frames (and an .mp4 when imageio's
ffmpeg is available)."""

from __future__ import annotations

import os
import sys

import numpy as np
import jax.numpy as jnp

from ..config import load_config
from ..utils import envmap as EM
from .render import save_image


def load_envmap_sh(path: str, deg: int) -> np.ndarray:
    if path.endswith(".npy"):
        return np.load(path).reshape(-1, 3)[: (deg + 1) ** 2]
    if path.endswith(".exr"):
        import cv2

        img = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)[..., ::-1]
    else:
        from PIL import Image

        img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return EM.project_envmap_to_sh(np.asarray(img, np.float32), deg)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    kwargs = {a.split("=", 1)[0][2:]: a.split("=", 1)[1] for a in argv if a.startswith("--")}
    cfg = load_config([a for a in argv if not a.startswith("--")])

    from ..renderer import render as render_fn
    from ..trainer import Relightable3DGWTrainer, pad_cameras

    trainer = Relightable3DGWTrainer(cfg)
    iteration = cfg.model.load_iteration or 0
    if iteration:
        trainer.load_checkpoint(iteration)

    envmap_path = kwargs["envmap"]
    view_name = kwargs.get("view")
    n_steps = int(kwargs.get("steps", 30))
    deg = cfg.model.envlight_sh_degree

    views, _, _ = pad_cameras(trainer.test_cameras or trainer.train_cameras)
    view = next((v for v in views if v["cam"].image_name == view_name), views[0])
    base0 = load_envmap_sh(envmap_path, deg)

    out_dir = os.path.join(trainer.model_path, "relit_novel_view", f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    sky_sh = jnp.zeros((1, (cfg.model.sky_sh_degree + 1) ** 2, 3), jnp.float32)
    frames = []
    import jax

    @jax.jit
    def render_one(base):
        out = render_fn(trainer.state.params["gaussians"], trainer.state.gauss_state,
                        base, sky_sh, view["cam"].matrices(), trainer.rcfg,
                        trainer.bg_color, jnp.asarray(view["sky_mask"]),
                        envlight_sh_degree=deg, sky_sh_degree=cfg.model.sky_sh_degree,
                        specular=cfg.model.specular, fix_sky=True, debug=False)
        return jnp.clip(out.render, 0, 1)

    h, w = view["cam"].height, view["cam"].width
    for i in range(n_steps):
        angle = 2 * np.pi * i / n_steps
        base = jnp.asarray(EM.rotate_sh(base0, pitch=angle), jnp.float32)
        img = np.asarray(render_one(base))[:h, :w]
        save_image(os.path.join(out_dir, f"frame_{i:03d}.png"), img)
        frames.append((img * 255).astype(np.uint8))
        print(f"frame {i + 1}/{n_steps}")

    try:
        import imageio.v3 as iio

        iio.imwrite(os.path.join(out_dir, "relit_sweep.mp4"), np.stack(frames), fps=10)
    except Exception as e:  # ffmpeg plugin may be absent; frames remain on disk
        print(f"video export skipped: {e}")


if __name__ == "__main__":
    main()
