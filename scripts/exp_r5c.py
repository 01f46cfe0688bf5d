"""r5 packed-RGB serving probe: frame time + kernel parity for packed_rgb.

packed_rgb (RasterizerConfig) quantizes entry R/B to 12-bit fixed point packed
into ONE f32 feature row (G exact), shrinking the serving feature pack from a
16-row padded gather to 8 rows. This measures, at 1M/800^2 (iso + aniso8):
  - e2e render-mode frame time: exact vs packed vs skip_alpha LOD vs both;
  - REAL-TPU kernel parity: the packed kernel must equal the plain kernel fed
    host-dequantized colors BITWISE (the packing integers are exact in f32 and
    the unpack arithmetic is f32-exact), plus the max deviation vs the exact
    render (bound: PACK_LIM/PACK_LEVELS/2 per packed channel, G exact).

Results -> /tmp/exp_r5c.json (repo artifact EXP_r05d.json).
Run (TPU, one process — never alongside another TPU job): python scripts/exp_r5c.py
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


def run_case(aniso, skip_alpha, packed, iters=10, want_img=True):
    os.environ["BENCH_ANISO"] = str(aniso)
    os.environ["BENCH_ROW_INTERVALS"] = "0"  # net cost in fwd-only (exp_r5a)
    os.environ["BENCH_SKIP_ALPHA"] = str(skip_alpha)
    os.environ["BENCH_MODE"] = "render"
    os.environ["BENCH_PACKED"] = "1" if packed else "0"
    os.environ.pop("BENCH_MAX_DUP", None)
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    arrs, cam, cfg = build(1_000_000, 800, 800)
    bg = jnp.zeros(3, jnp.float32)
    fwd = jax.jit(lambda a: rasterize(*a, bg, cam, cfg))
    (img, aux), dt = timeit(fwd, arrs, iters=iters, quiet=True)
    img_h = np.asarray(img) if want_img else None
    return img_h, dt, int(aux.overflow), cfg.max_dup, arrs, cam, cfg


def parity_check(arrs, cam, cfg):
    """Packed kernel vs plain kernel on host-dequantized colors: bitwise."""
    from relightable3dgaussians_w_tpu.ops.pallas.tile_composite import (
        PACK_LEVELS, PACK_LIM, pack_rb)
    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    bg = jnp.zeros(3, jnp.float32)
    rb, g = pack_rb(arrs[4])
    q_r = jnp.floor(rb * (1.0 / 4096.0))
    step = PACK_LIM / PACK_LEVELS
    deq = jnp.stack([q_r * step, g, (rb - q_r * 4096.0) * step], axis=-1)
    img_p, _ = jax.jit(lambda a: rasterize(*a, bg, cam, cfg._replace(packed_rgb=True)))(arrs)
    img_d, _ = jax.jit(lambda a: rasterize(*a, bg, cam, cfg._replace(packed_rgb=False)))(
        arrs[:4] + (deq,))
    return bool(np.array_equal(np.asarray(img_p), np.asarray(img_d)))


def main():
    out = {}
    t0 = time.time()
    # Plain sa8 rows are already in EXP_r05c.json (aniso1 37.72 ms / aniso8
    # 68.75 ms at sa16); only the packed variants are new compiles here.
    cases = {
        1.0: (("exact", 1.0 / 255.0, False), ("packed", 1.0 / 255.0, True),
              ("sa8_packed", 1.0 / 8.0, True)),
        8.0: (("exact", 1.0 / 255.0, False), ("sa8_packed", 1.0 / 8.0, True)),
    }
    for aniso in (1.0, 8.0):
        exact_img = None
        for name, sa, packed in cases[aniso]:
            img, dt, ovf, md, arrs, cam, cfg = run_case(aniso, sa, packed)
            rec = dict(ms=round(dt, 2), fps=round(1e3 / dt, 1), overflow=ovf,
                       max_dup=md)
            if exact_img is None:
                exact_img = img
            else:
                mse = float(np.mean((img - exact_img) ** 2))
                rec["psnr_vs_exact"] = round(10 * np.log10(1.0 / max(mse, 1e-12)), 2)
                rec["max_abs_vs_exact"] = round(float(np.max(np.abs(img - exact_img))), 6)
            if name == "packed":
                rec["bitwise_vs_dequantized_plain"] = parity_check(arrs, cam, cfg)
            key = f"aniso{int(aniso)}_{name}"
            out[key] = rec
            print(f"[{time.time()-t0:7.1f}s] {key}: {rec}", flush=True)
    with open("/tmp/exp_r5c.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
