"""End-to-end NeRF-OSR-layout training: build a synthetic on-disk scene in the
reference's NeRF-OSR directory layout (COLMAP sparse/0 text + sky_masks/ + masks/ +
train/rgb, test/rgb split listings, dataset_readers.py:153-210) and run the train
CLI on it — exercising the reader path the real benchmark scenes use
(VERDICT r1 next-step #4)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


def make_nerfosr_dataset(root, n_train=3, n_test=1, size=64):
    n = n_train + n_test
    os.makedirs(os.path.join(root, "sparse/0"), exist_ok=True)
    for d in ("images", "sky_masks", "masks", "train/rgb", "test/rgb"):
        os.makedirs(os.path.join(root, d), exist_ok=True)
    rng = np.random.RandomState(0)

    f = 0.8 * size
    with open(os.path.join(root, "sparse/0/cameras.txt"), "w") as fh:
        fh.write("# cameras\n")
        fh.write(f"1 SIMPLE_PINHOLE {size} {size} {f} {size/2} {size/2}\n")

    img_lines = ["# images"]
    for i in range(n):
        angle = 0.15 * (i - n / 2)
        # world->cam: camera orbiting origin at radius 4 (COLMAP convention:
        # qvec/tvec are world->cam).
        c = np.array([4 * np.sin(angle), 0.0, -4 * np.cos(angle)])
        fwd = -c / np.linalg.norm(c)
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        Rwc = np.stack([right, up, fwd], axis=0)  # world->cam rows
        t = -Rwc @ c
        # rotmat -> quaternion (w, x, y, z)
        tr = np.trace(Rwc)
        w = np.sqrt(max(1 + tr, 1e-12)) / 2
        x = (Rwc[2, 1] - Rwc[1, 2]) / (4 * w)
        y = (Rwc[0, 2] - Rwc[2, 0]) / (4 * w)
        z = (Rwc[1, 0] - Rwc[0, 1]) / (4 * w)
        name = f"img_{i:03d}.png"
        img_lines.append(
            f"{i+1} {w} {x} {y} {z} {t[0]} {t[1]} {t[2]} 1 {name}")
        img_lines.append("")  # empty 2D point list line

        img = rng.uniform(0.2, 0.8, (size, size, 3))
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "images", name))
        mask = np.full((size, size), 255, np.uint8)
        stem = f"img_{i:03d}"
        Image.fromarray(mask).save(os.path.join(root, "sky_masks", stem + "_mask.png"))
        Image.fromarray(mask).save(os.path.join(root, "masks", stem + ".png"))
        split = "train" if i < n_train else "test"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, split, "rgb", name))

    with open(os.path.join(root, "sparse/0/images.txt"), "w") as fh:
        fh.write("\n".join(img_lines) + "\n")

    with open(os.path.join(root, "sparse/0/points3D.txt"), "w") as fh:
        fh.write("# points\n")
        pts = rng.uniform(-1, 1, (150, 3))
        for i, p in enumerate(pts):
            fh.write(f"{i+1} {p[0]} {p[1]} {p[2]} 128 128 128 0.5 1 0\n")


def test_nerfosr_reader_and_train_cli(tmp_path):
    data = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    make_nerfosr_dataset(data)

    # Reader dispatch must pick the NeRF-OSR path (train/rgb present).
    from relightable3dgaussians_w_tpu.data.readers import load_scene_info

    info = load_scene_info(data, None, True, -1, False)
    assert len(info.train_cameras) == 3
    assert len(info.test_cameras) == 1
    assert info.train_cameras[0].sky_mask is not None
    assert info.train_cameras[0].occluders_mask is not None

    # Train CLI end-to-end on the same scene.
    from relightable3dgaussians_w_tpu.cli.train import main

    main([f"dataset.source_path={data}", f"dataset.model_path={out}",
          "dataset.eval=true",
          "optimizer.iterations=12", "optimizer.densify_from_iter=4",
          "optimizer.densification_interval=6",
          "optimizer.opacity_reset_interval=10000",
          "optimizer.reg_normal_from_iter=0",
          "runtime.pool_capacity=8192", "runtime.max_dup=16384",
          "runtime.max_tiles_per_gauss=16", "runtime.lmax_per_tile=256",
          "runtime.tile_chunk=4",
          "model.init_embeddings=false", "model.init_sh_mlp=false"])

    log = os.path.join(out, "train_log.jsonl")
    with open(log) as fh:
        recs = [json.loads(l) for l in fh]
    assert np.isfinite([r["loss"] for r in recs if "loss" in r]).all()
    # In-training eval produced test-set PSNR + panels (train.py:191-265 analog).
    assert any("test_psnr_mean_emb" in r for r in recs)
    assert os.path.isdir(os.path.join(out, "panels", "iteration_12"))
