"""The full evaluation chain as ONE asserted pipeline (VERDICT r2 item 6):

    train CLI -> render CLI -> metrics CLI -> eval_gt_envmaps CLI

on a synthetic NeRF-OSR-layout scene with a synthetic GT envmap — the rehearsal of
the reference's `full_eval.py:37-59` that no per-CLI test performs. Asserts every
stage's artifact exists and the metric values are finite.
"""

import json
import os

import numpy as np
import pytest
from PIL import Image

from test_nerfosr_e2e import make_nerfosr_dataset


def test_full_eval_pipeline(tmp_path):
    scene = "lk2"
    data_root = str(tmp_path / "data")
    output = str(tmp_path / "out")
    src = os.path.join(data_root, scene)
    make_nerfosr_dataset(src)

    # Synthetic GT envmap (equirect) + per-view test config for the one test view
    # (img_003), matching the reference's test_configs/<scene>/test_config.py
    # schema (test_configs/lk2/test_config.py:3-74).
    rng = np.random.RandomState(9)
    env = (rng.uniform(0.2, 1.0, (32, 64, 3)) * 255).astype(np.uint8)
    env_path = os.path.join(data_root, "envmap_003.png")
    Image.fromarray(env).save(env_path)
    mask_path = os.path.join(src, "masks", "img_003.png")
    tc_dir = os.path.join(data_root, "test_configs", scene)
    os.makedirs(tc_dir, exist_ok=True)
    with open(os.path.join(tc_dir, "test_config.json"), "w") as f:
        json.dump({
            "img_003": {
                "env_map_path": env_path,
                "mask_path": mask_path,
                "initial_env_map_rotation": {"x": -90, "y": 0, "z": 0},
                "sun_angles": [0, 360],
                "env_map_scaling": {"threshold": 0.999, "scale": 10},
            }
        }, f)

    from relightable3dgaussians_w_tpu.cli.full_eval import main as full_eval

    full_eval([
        f"--data_root={data_root}", f"--output={output}", f"--scenes={scene}",
        "optimizer.iterations=10", "optimizer.densify_from_iter=10000",
        "optimizer.reg_normal_from_iter=0",
        "runtime.pool_capacity=4096", "runtime.max_dup=16384",
        "runtime.max_tiles_per_gauss=16", "runtime.lmax_per_tile=256",
        "runtime.tile_chunk=4",
        "model.init_embeddings=false", "model.init_sh_mlp=false",
    ])

    mp = os.path.join(output, scene)
    # train wrote the checkpoint the later stages load
    assert os.path.isdir(os.path.join(mp, "point_cloud", "iteration_10"))
    # render wrote test renders
    renders = os.path.join(mp, "test", "iteration_10", "renders")
    assert os.path.isdir(renders) and len(os.listdir(renders)) >= 1
    # metrics wrote results.json with finite numbers for the test split
    with open(os.path.join(mp, "results.json")) as f:
        results = json.load(f)
    res = results["test/iteration_10"]
    assert np.isfinite(res["psnr"]) and res["psnr"] > 0
    # gt-envmap eval wrote metrics.txt with a finite mean PSNR
    mt = os.path.join(mp, "relit_gt_envmaps", "iteration_10", "metrics.txt")
    with open(mt) as f:
        lines = f.read().strip().splitlines()
    mean_line = [l for l in lines if l.startswith("mean PSNR")][0]
    mean_psnr = float(mean_line.split(":")[1])
    assert np.isfinite(mean_psnr) and mean_psnr > 0
