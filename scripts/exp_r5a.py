"""r5 perf probes: serving (fwd-only) knob sweep + opacity-correct stage pies.

Targets (VERDICT r4 items 3/4): serving <= 30 ms/frame at 1M/800^2; train
iso >= 7.5M px/s, aniso-8 >= 6M px/s. This measures where the time actually is
before touching kernels:
  A. render-mode e2e: chunk x tiles_per_step x row_intervals
  B. stage pies (opacity-tightened preprocess, unlike scripts/profile_stages
     which inflated D by skipping opacities) for render-iso and train-aniso8
  C. train-mode e2e at aniso8 with/without intervals (confirm r4 rows)

Run: python scripts/exp_r5a.py   (TPU; batches all compiles in one process)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from scripts.tputime import timeit


def render_e2e(n=1_000_000, res=800, aniso=1.0, row_iv="auto", chunk=512,
               tps=4, iters=10):
    os.environ["BENCH_ANISO"] = str(aniso)
    os.environ["BENCH_ROW_INTERVALS"] = row_iv
    os.environ["BENCH_CHUNK"] = str(chunk)
    os.environ.pop("BENCH_MAX_DUP", None)
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    arrs, cam, cfg = build(n, res, res)
    cfg = cfg._replace(tiles_per_step=tps)
    bg = jnp.zeros(3, jnp.float32)
    fwd = jax.jit(lambda a: rasterize(*a, bg, cam, cfg))
    (img, aux), dt = timeit(fwd, arrs, iters=iters, quiet=True)
    return dt, int(aux.overflow), cfg.max_dup, cfg.row_intervals


def train_e2e(n=1_000_000, res=800, aniso=1.0, row_iv="auto", iters=10):
    os.environ["BENCH_ANISO"] = str(aniso)
    os.environ["BENCH_ROW_INTERVALS"] = row_iv
    os.environ.pop("BENCH_MAX_DUP", None)
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import (
        rasterize, make_rasterize_grad_split)

    arrs, cam, cfg = build(n, res, res)
    bg = jnp.zeros(3, jnp.float32)

    def img_loss(img, aux):
        return jnp.sum(img) + jnp.sum(aux.alpha)

    split_step = make_rasterize_grad_split(cam, cfg, img_loss)
    step = lambda *a: split_step(*a, bg)[1]
    g, dt = timeit(step, *arrs, iters=iters, quiet=True)
    return dt, cfg.max_dup, cfg.row_intervals


def pie(n=1_000_000, res=800, aniso=1.0, row_iv="auto", mode="train"):
    os.environ["BENCH_ANISO"] = str(aniso)
    os.environ["BENCH_ROW_INTERVALS"] = row_iv
    os.environ.pop("BENCH_MAX_DUP", None)
    from bench import build
    from scripts.stage_pie import measure_stage_pie

    arrs, cam, cfg = build(n, res, res)
    bg = jnp.zeros(3, jnp.float32)
    return measure_stage_pie(arrs, cam, cfg, bg, mode=mode), cfg.max_dup


def main():
    out = {}
    t0 = time.time()

    def rec(k, v):
        out[k] = v
        print(f"[{time.time()-t0:7.1f}s] {k}: {v}", flush=True)

    # A. serving sweep (iso)
    for chunk in (512, 1024):
        for tps in (4, 8):
            dt, ovf, md, riv = render_e2e(chunk=chunk, tps=tps)
            rec(f"render_iso_c{chunk}_t{tps}", dict(ms=round(dt, 2),
                overflow=ovf, max_dup=md, row_iv=riv))
    dt, ovf, md, riv = render_e2e(row_iv="1")
    rec("render_iso_rowiv1", dict(ms=round(dt, 2), overflow=ovf, max_dup=md))

    # B. pies
    p, md = pie(mode="render")
    rec("pie_render_iso", dict(max_dup=md, **{k: round(v, 2) for k, v in p.items()}))
    p, md = pie(mode="train", aniso=8.0)
    rec("pie_train_aniso8", dict(max_dup=md, **{k: round(v, 2) for k, v in p.items()}))

    # C. aniso train e2e (auto should enable intervals)
    dt, md, riv = train_e2e(aniso=8.0, row_iv="auto")
    rec("train_aniso8_auto", dict(ms=round(dt, 2), max_dup=md, row_iv=riv))
    dt, md, riv = train_e2e(aniso=8.0, row_iv="0")
    rec("train_aniso8_off", dict(ms=round(dt, 2), max_dup=md, row_iv=riv))
    # iso current default
    dt, md, riv = train_e2e(aniso=1.0, row_iv="auto")
    rec("train_iso_auto", dict(ms=round(dt, 2), max_dup=md, row_iv=riv))

    # serving at aniso (viewer on a trained scene)
    dt, ovf, md, riv = render_e2e(aniso=8.0)
    rec("render_aniso8_auto", dict(ms=round(dt, 2), overflow=ovf, max_dup=md,
                                   row_iv=riv))

    with open("/tmp/exp_r5a.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
