"""GT-envmap relighting evaluation CLI.

TPU-native equivalent of the reference's `eval_with_gt_envmaps.py` (full variant
:235-399): per test view, project its GT envmap to SH (with saturation boosting),
apply the per-scene initial rotation, sweep 51 sun angles about y, keep the best
masked PSNR, and write metrics.txt + renders. Test configs are JSON files (the
reference imports python dicts via importlib; same schema, safer format — a python
test_config.py with a `config` dict is also accepted).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import numpy as np
from PIL import Image

from ..config import load_config
from ..evaluation import eval_view_with_gt_envmap
from .render import save_image


def load_test_config(path: str) -> dict:
    jpath = os.path.join(path, "test_config.json")
    if os.path.exists(jpath):
        with open(jpath) as f:
            return json.load(f)
    ppath = os.path.join(path, "test_config.py")
    spec = importlib.util.spec_from_file_location("test_config", ppath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.config


def _erode(mask: np.ndarray, k: int = 5, iterations: int = 1) -> np.ndarray:
    import cv2

    return cv2.erode(mask, np.ones((k, k), np.uint8), iterations=iterations)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config([a for a in argv if not a.startswith("--")])

    from ..trainer import Relightable3DGWTrainer, pad_cameras

    trainer = Relightable3DGWTrainer(cfg)
    iteration = cfg.model.load_iteration or 0
    if iteration:
        trainer.load_checkpoint(iteration)

    test_config = load_test_config(cfg.dataset.test_config_path)
    names = {k.split(".")[0] for k in test_config}
    views, _, _ = pad_cameras([c for c in trainer.test_cameras if c.image_name in names])

    out_dir = os.path.join(trainer.model_path, "relit_gt_envmaps", f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    metrics_lines = []
    psnrs = []
    for view in views:
        nm = view["cam"].image_name
        icfg = next(v for k, v in test_config.items() if k.split(".")[0] == nm)
        envmap = np.asarray(Image.open(icfg["env_map_path"]).convert("RGB"), np.float32) / 255.0
        mask = np.asarray(Image.open(icfg["mask_path"]).convert("L"), np.uint8)
        import cv2

        mask = cv2.resize(mask, (trainer.W, trainer.H))
        mask = (_erode(mask) // 255).astype(np.float32)
        rot = icfg["initial_env_map_rotation"]
        res = eval_view_with_gt_envmap(
            trainer.state.params, trainer.state.gauss_state, cfg, trainer.rcfg, view,
            envmap, mask,
            init_rot=(rot["x"], rot["y"], rot["z"]),
            sun_angle_range=tuple(icfg["sun_angles"]),
            threshold=icfg["env_map_scaling"]["threshold"],
            scale=icfg["env_map_scaling"]["scale"],
        )
        h, w = view["cam"].height, view["cam"].width
        save_image(os.path.join(out_dir, nm + ".png"), res.image[:h, :w])
        line = (f"{nm}: PSNR {res.psnr:.3f} MAE {res.mae:.5f} MSE {res.mse:.6f} "
                f"best_angle {res.best_angle:.3f}")
        print(line)
        metrics_lines.append(line)
        psnrs.append(res.psnr)
    metrics_lines.append(f"mean PSNR: {np.mean(psnrs):.3f}")
    with open(os.path.join(out_dir, "metrics.txt"), "w") as f:
        f.write("\n".join(metrics_lines) + "\n")


if __name__ == "__main__":
    main()
