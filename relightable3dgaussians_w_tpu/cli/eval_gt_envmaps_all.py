"""GT-envmap evaluation over ALL test views grouped by lighting condition.

TPU-native equivalent of the reference's `eval_with_gt_envmaps_all.py` (273 LoC):
every test view whose lighting condition has a GT envmap is relit with it (one
envmap serves all views of its condition); `--random_sun` uses a single random sun
angle instead of the best-of-51 sweep."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
from PIL import Image

from ..config import load_config
from ..evaluation import eval_view_with_gt_envmap
from ..pretrain import lighting_condition_of
from .eval_gt_envmaps import load_test_config, _erode
from .render import save_image


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    random_sun = "--random_sun" in argv
    cfg = load_config([a for a in argv if not a.startswith("--")])

    from ..trainer import Relightable3DGWTrainer, pad_cameras

    trainer = Relightable3DGWTrainer(cfg)
    iteration = cfg.model.load_iteration or 0
    if iteration:
        trainer.load_checkpoint(iteration)

    test_config = load_test_config(cfg.dataset.test_config_path)
    # One config entry per lighting condition; apply it to every matching view.
    by_condition = {lighting_condition_of(k.split(".")[0]): v for k, v in test_config.items()}
    views, _, _ = pad_cameras(trainer.test_cameras)

    out_dir = os.path.join(trainer.model_path, "relit_gt_envmaps_all", f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    results = {}
    for view in views:
        nm = view["cam"].image_name
        lc = lighting_condition_of(nm)
        icfg = by_condition.get(lc)
        if icfg is None:
            continue
        envmap = np.asarray(Image.open(icfg["env_map_path"]).convert("RGB"), np.float32) / 255.0
        import cv2

        mask = np.asarray(Image.open(icfg["mask_path"]).convert("L"), np.uint8)
        mask = cv2.resize(mask, (trainer.W, trainer.H))
        mask = (_erode(mask) // 255).astype(np.float32)
        rot = icfg["initial_env_map_rotation"]
        lo, hi = icfg["sun_angles"]
        if random_sun:
            a = float(rng.uniform(lo, hi))
            sweep = dict(sun_angle_range=(a, a), n_angles=1)
        else:
            sweep = dict(sun_angle_range=(lo, hi), n_angles=51)
        res = eval_view_with_gt_envmap(
            trainer.state.params, trainer.state.gauss_state, cfg, trainer.rcfg, view,
            envmap, mask, init_rot=(rot["x"], rot["y"], rot["z"]),
            threshold=icfg["env_map_scaling"]["threshold"],
            scale=icfg["env_map_scaling"]["scale"], **sweep,
        )
        h, w = view["cam"].height, view["cam"].width
        save_image(os.path.join(out_dir, nm + ".png"), res.image[:h, :w])
        results[nm] = {"psnr": res.psnr, "mae": res.mae, "mse": res.mse,
                       "angle": res.best_angle}
        print(nm, results[nm])
    if results:
        results["mean"] = {k: float(np.mean([v[k] for n, v in results.items() if n != "mean"]))
                           for k in ("psnr", "mae", "mse")}
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
