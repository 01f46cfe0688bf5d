"""Reference-schedule-scale rehearsal (VERDICT r4 item 5): >=20k iterations at
512^2 with the REAL schedule — densify from 500 every 500 until 15k, opacity
resets every 3k, demand-sized entry budget with overflow healing live, and a
pool that STARTS TIGHT so densification growth (grow_train_state + re-jit) is
exercised — through the actual CLI chain (cli/full_eval: train -> render ->
metrics -> eval_gt_envmaps). Records REHEARSAL_r05.json with the PSNR
trajectory, alive-count trajectory, overflow/heal/growth event counts, and
wall-clock.

Run (TPU, ~30-90 min): python scripts/rehearsal_r05.py [iters=20000] [res=512]
"""

import json
import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

from scripts.rehearsal_r04 import render_gt_views  # dataset-from-GT builder


def main(iters=20_000, res=512):
    from PIL import Image

    from test_nerfosr_e2e import make_nerfosr_dataset

    root = os.environ.get("REHEARSAL_DIR", "/tmp/rehearsal_r05")
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

    t0 = time.time()
    # REFERENCE schedule (configs/optimizer/optimization_params.yaml:3,13-17):
    # densify 500..15000 every 500, opacity reset every 3000 — these are the
    # config defaults; only iterations is overridden. Growth/healing pressure:
    # pool_headroom 2.0 (vs default 8) so densification outgrows capacity and
    # grow_train_state fires; max_dup=0 demand-sizes the entry budget tight so
    # healing fires as splats grow.
    full_eval([
        f"--data_root={data_root}", f"--output={output}", f"--scenes={scene}",
        f"optimizer.iterations={iters}",
        f"optimizer.densify_until_iter={min(15_000, iters * 3 // 4)}",
        "runtime.pool_headroom=2.0",
        "runtime.max_dup=0",
        "runtime.lmax_per_tile=1024", "runtime.tile_chunk=8",
        "model.init_embeddings=false", "model.init_sh_mlp=false",
    ])
    wall_s = time.time() - t0

    mp = os.path.join(output, scene)
    with open(os.path.join(mp, "train_log.jsonl")) as f:
        recs = [json.loads(l) for l in f]
    psnrs = [(r["iter"], r["psnr"]) for r in recs if "psnr" in r]
    alive = [(r["iter"], r["alive"]) for r in recs if "alive" in r]
    overflow_events = sum(1 for r in recs if r.get("overflow", 0) > 0)

    summary = {
        "iters": iters, "res": res, "scene_dir": mp,
        "wall_clock_s": round(wall_s, 1),
        "train_psnr_first": psnrs[0][1], "train_psnr_last": psnrs[-1][1],
        "train_psnr_best": max(p for _, p in psnrs),
        "psnr_trajectory": psnrs[:: max(len(psnrs) // 40, 1)],
        "alive_first": alive[0][1], "alive_last": alive[-1][1],
        "alive_growth_x": round(alive[-1][1] / max(alive[0][1], 1), 2),
        "alive_trajectory": alive[:: max(len(alive) // 40, 1)],
        "overflow_log_events": overflow_events,
        "schedule": {"densify": "500..15000 every 500 (config defaults)",
                     "opacity_reset": "every 3000 (config default)",
                     "pool_headroom": 2.0, "max_dup": "demand-sized"},
    }
    for cand in ("results.json", "metrics.json"):
        p = os.path.join(mp, cand)
        if os.path.exists(p):
            summary["metrics"] = json.load(open(p))
    import jax

    summary["backend"] = jax.default_backend()
    out_name = os.environ.get("REHEARSAL_OUT", "REHEARSAL_r05.json")
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), out_name)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, default=str)
    print(f"wrote {out_name}:", json.dumps(summary, default=str)[:600])
    ok = summary["train_psnr_best"] >= 25.0 and summary["train_psnr_last"] >= 22.0
    if not ok:
        print(f"REHEARSAL FAILED: best {summary['train_psnr_best']:.2f} / "
              f"last {summary['train_psnr_last']:.2f}")
    return 0 if ok else 1


if __name__ == "__main__":
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    sys.exit(main(iters, res))
