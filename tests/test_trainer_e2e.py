"""End-to-end trainer smoke test: build a tiny on-disk Blender-format dataset from
images rendered by our own renderer, then train from random init and check the loss
decreases and checkpoints appear in the reference layout."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from relightable3dgaussians_w_tpu.config import Config
from relightable3dgaussians_w_tpu.data.ply import write_ply, read_ply


def make_dataset(root, n_views=3, size=64):
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    rng = np.random.RandomState(0)

    frames = []
    for i in range(n_views):
        angle = 0.2 * (i - 1)
        # Simple orbit: camera at radius 4 looking at origin (COLMAP convention).
        c2w = np.eye(4)
        c2w[:3, 3] = [4 * np.sin(angle), 0, -4 * np.cos(angle)]
        fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, fwd
        # Convert to blender convention (the reader converts back).
        c2w_b = c2w.copy()
        c2w_b[:3, 1:3] *= -1
        img = rng.uniform(0.2, 0.8, (size, size, 3))
        name = f"r_{i}"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(root, "train", name + ".png"))
        frames.append({"file_path": f"train/{name}", "transform_matrix": c2w_b.tolist()})

    with open(os.path.join(root, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    pts = rng.uniform(-1, 1, (200, 3))
    write_ply(os.path.join(root, "points3d.ply"), {
        "x": pts[:, 0], "y": pts[:, 1], "z": pts[:, 2],
        "nx": np.zeros(200), "ny": np.zeros(200), "nz": np.zeros(200),
        "red": rng.uniform(0, 255, 200), "green": rng.uniform(0, 255, 200),
        "blue": rng.uniform(0, 255, 200),
    })


def test_trainer_end_to_end(tmp_path):
    data = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    make_dataset(data)

    from relightable3dgaussians_w_tpu.trainer import Relightable3DGWTrainer

    cfg = Config()
    cfg.dataset.source_path = data
    cfg.dataset.model_path = out
    cfg.optimizer.densify_from_iter = 10
    cfg.optimizer.densification_interval = 15
    cfg.optimizer.opacity_reset_interval = 10_000
    cfg.optimizer.reg_normal_from_iter = 0
    cfg.runtime.pool_capacity = 4096
    cfg.runtime.max_dup = 1 << 14
    cfg.runtime.max_tiles_per_gauss = 16
    cfg.runtime.lmax_per_tile = 256
    cfg.runtime.tile_chunk = 4

    trainer = Relightable3DGWTrainer(cfg)
    trainer.train(iterations=40, save_iterations=(40,), log_every=10)

    with open(trainer.log_path) as f:
        recs = [json.loads(l) for l in f]
    losses = [r["loss"] for r in recs if "loss" in r]  # eval records lack it
    assert any("test_psnr_mean_emb" in r or "train_psnr" in r for r in recs)  # eval ran
    assert os.path.isdir(os.path.join(out, "panels", "iteration_40"))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # Reference checkpoint layout (SURVEY.md §3.5).
    assert os.path.exists(os.path.join(out, "point_cloud/iteration_40/point_cloud.ply"))
    # SIBR camera manifest (scene/__init__.py:70, camera_utils.py:74-94)
    with open(os.path.join(out, "cameras.json")) as f:
        cams_json = json.load(f)
    assert cams_json and {"id", "img_name", "width", "height", "position",
                          "rotation", "fy", "fx"} <= set(cams_json[0])
    assert os.path.exists(os.path.join(out, "checkpoint_embeddings/iteration_40/embeddings_weights.npz"))
    assert os.path.exists(os.path.join(out, "checkpoint_MLP/iteration_40/MLP_weights.npz"))
    envl_dir = os.path.join(out, "envlights_sh/iteration_40")
    assert len(os.listdir(envl_dir)) == 3

    # PLY loads back with all reference attributes.
    v = read_ply(os.path.join(out, "point_cloud/iteration_40/point_cloud.ply"))
    for k in ("x", "albedo_0", "opacity", "scale_2", "rot_3", "roughness",
              "metalness", "is_sky", "sky_radius", "sky_gauss_center_2", "sky_angles_1"):
        assert k in v, k

    # Full-state resume round trip.
    st = trainer.state
    trainer.load_full_state(40)
    assert int(trainer.state.step) == int(st.step)

    # Reference-style warm start (PLY + embeddings + MLP, no optimizer state):
    # remove the native bundle so load_checkpoint(-1) takes the PLY path.
    import shutil

    shutil.rmtree(os.path.join(out, "full_state"))
    n_alive_before = int(np.asarray(st.gauss_state.alive).sum())
    trainer.load_checkpoint(-1)
    import jax.numpy as jnp2
    from relightable3dgaussians_w_tpu.models import gaussians as G

    assert int(jnp2.sum(trainer.state.gauss_state.alive)) == n_alive_before
    xyz_loaded = np.asarray(G.get_xyz(trainer.state.params["gaussians"],
                                      trainer.state.gauss_state))
    xyz_saved = np.asarray(G.get_xyz(st.params["gaussians"], st.gauss_state))
    alive = np.asarray(st.gauss_state.alive)
    # The loaded pool is compacted; compare as sets via sorted coordinates.
    np.testing.assert_allclose(
        np.sort(xyz_loaded[np.asarray(trainer.state.gauss_state.alive)].ravel()),
        np.sort(xyz_saved[alive].ravel()), atol=1e-5)


def test_load_gaussians_ply_roundtrip(tmp_path):
    from relightable3dgaussians_w_tpu.trainer import load_gaussians_ply
    from relightable3dgaussians_w_tpu.models import gaussians as G

    # Minimal synthetic pool -> save-style fields -> load.
    n = 10
    rng = np.random.RandomState(0)
    fields = {
        "x": rng.normal(size=n), "y": rng.normal(size=n), "z": rng.normal(size=n),
        "opacity": rng.normal(size=n), "roughness": rng.normal(size=n),
        "metalness": rng.normal(size=n), "is_sky": np.zeros(n),
        "sky_radius": np.full(n, 5.0),
    }
    for i in range(3):
        fields[f"albedo_{i}"] = rng.normal(size=n)
        fields[f"scale_{i}"] = rng.normal(size=n)
        fields[f"sky_gauss_center_{i}"] = np.full(n, float(i))
    for i in range(4):
        fields[f"rot_{i}"] = rng.normal(size=n)
    for i in range(2):
        fields[f"sky_angles_{i}"] = np.zeros(n)
    p = str(tmp_path / "pc.ply")
    write_ply(p, fields)
    params, state = load_gaussians_ply(p, capacity=32)
    assert int(jnp.sum(state.alive)) == n
    np.testing.assert_allclose(float(params.sky_radius), 5.0)
    np.testing.assert_allclose(np.asarray(state.sky_center), [0, 1, 2])


def test_demand_sized_entry_budget(tmp_path):
    """runtime.max_dup=0 sizes the static entry budget from measured scene
    demand (x1.3 headroom, 4096-rounded) instead of the fixed default —
    sort/gather/segment-sum cost scales with this static budget (BENCH_LOG r4)."""
    data = str(tmp_path / "scene")
    make_dataset(data)

    from relightable3dgaussians_w_tpu.trainer import Relightable3DGWTrainer
    from relightable3dgaussians_w_tpu.config import Config

    cfg = Config()
    cfg.dataset.source_path = data
    cfg.dataset.model_path = str(tmp_path / "out")
    cfg.optimizer.reg_normal_from_iter = 0
    cfg.runtime.pool_capacity = 4096
    cfg.runtime.max_dup = 0
    cfg.runtime.max_tiles_per_gauss = 16
    cfg.runtime.lmax_per_tile = 256
    cfg.runtime.tile_chunk = 4

    trainer = Relightable3DGWTrainer(cfg)
    assert trainer.rcfg.max_dup % 4096 == 0
    assert (1 << 15) <= trainer.rcfg.max_dup <= (1 << 23)
    trainer.train(iterations=3, save_iterations=(), log_every=2,
                  test_iterations=())
