"""r5 serving LOD probe: render-mode e2e + image deviation for skip_alpha.

skip_alpha (RasterizerConfig) tightens rects/intervals to the alpha >= s
ellipse: s = 1/255 is the compositors' exact skip (bitwise-identical render);
s > 1/255 drops entries whose peak in-tile alpha < s — each dropped entry
contributes < s at any pixel. This measures the D-cut, the e2e frame time, and
the PSNR against the exact render at 1M/800^2 (iso + aniso8).

Run: python scripts/exp_r5b.py
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


def run_case(aniso, skip_alpha, iters=10):
    os.environ["BENCH_ANISO"] = str(aniso)
    os.environ["BENCH_ROW_INTERVALS"] = "0"  # intervals hurt fwd-only (exp_r5a)
    os.environ["BENCH_SKIP_ALPHA"] = str(skip_alpha)
    os.environ.pop("BENCH_MAX_DUP", None)
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    arrs, cam, cfg = build(1_000_000, 800, 800)
    bg = jnp.zeros(3, jnp.float32)
    fwd = jax.jit(lambda a: rasterize(*a, bg, cam, cfg))
    (img, aux), dt = timeit(fwd, arrs, iters=iters, quiet=True)
    return np.asarray(img), dt, int(aux.overflow), cfg.max_dup


def main():
    out = {}
    t0 = time.time()
    for aniso in (1.0, 8.0):
        exact_img = None
        for sa in (1.0 / 255.0, 1.0 / 64.0, 1.0 / 32.0, 1.0 / 16.0):
            img, dt, ovf, md = run_case(aniso, sa)
            rec = dict(ms=round(dt, 2), fps=round(1e3 / dt, 1), overflow=ovf,
                       max_dup=md)
            if exact_img is None:
                exact_img = img
            else:
                mse = float(np.mean((img - exact_img) ** 2))
                rec["psnr_vs_exact"] = round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)
            key = f"aniso{int(aniso)}_sa{round(1/sa)}"
            out[key] = rec
            print(f"[{time.time()-t0:7.1f}s] {key}: {rec}", flush=True)
    with open("/tmp/exp_r5b.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
