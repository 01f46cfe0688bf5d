"""White-light evaluation CLI — the reference's `eval_with_white_light.py`: render
every test view under uniform white illumination and score against the masked GT."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import jax.numpy as jnp

from ..config import load_config
from ..evaluation import eval_white_light
from ..utils import losses as LO
from .render import save_image


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config([a for a in argv if not a.startswith("--")])

    from ..trainer import Relightable3DGWTrainer, pad_cameras

    trainer = Relightable3DGWTrainer(cfg)
    iteration = cfg.model.load_iteration or 0
    if iteration:
        trainer.load_checkpoint(iteration)

    views, _, _ = pad_cameras(trainer.test_cameras or trainer.train_cameras)
    out_dir = os.path.join(trainer.model_path, "white_light", f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)

    results = {}
    for view in views:
        img = eval_white_light(trainer.state.params, trainer.state.gauss_state, cfg,
                               trainer.rcfg, view)
        nm = view["cam"].image_name
        h, w = view["cam"].height, view["cam"].width
        save_image(os.path.join(out_dir, nm + ".png"), img[:h, :w])
        imc = jnp.moveaxis(jnp.asarray(img[:h, :w]), -1, 0)
        gtc = jnp.moveaxis(jnp.asarray(view["image"][:h, :w]), -1, 0)
        occ = jnp.asarray(view["occluders_mask"][:h, :w])[None]
        results[nm] = {"psnr": float(LO.mse2psnr(LO.img2mse(imc, gtc, mask=occ)))}
        print(nm, results[nm])
    with open(os.path.join(out_dir, "results.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
