"""Real-TPU parity probe: Pallas rasterizer vs the jnp twin, at predicate-flip scale.

Interpret-mode CPU tests CANNOT catch Mosaic-level numerics (the power>0 predicate
incident, BENCH_LOG.md r1c 13:1x): discontinuous skip/termination predicates flip at
~1 pixel per 50M pixel-entry pairs, so parity must be probed on the REAL TPU at
>= 512^2 / 50k Gaussians. This is the committed form of the /tmp probe the verify
skill references — the TPU half of the twin discipline the reference applies to its
CUDA ops (scene/NVDIFFREC/renderutils/tests/test_bsdf.py:20-56).

Compares forward image + all 5 parameter gradient groups (means, scales, quats,
opacities, colors) between the Pallas path (use_pallas=True) and the jnp twin
(autodiff through the same semantics). Thresholds from BENCH_LOG.md r1c:
image 7.7e-5 observed -> 5e-4 budget; grads 4.2e-4 observed -> 3e-3 budget
(relative to grad scale).

Prints ONE JSON line {"ok": bool, ...}; exit code 1 on failure.
Run: `python scripts/tpu_parity.py` (or `BENCH_PARITY=1 python bench.py`).
Env: PARITY_N (default 50_000), PARITY_RES (512), PARITY_SEED (0).
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IMG_TOL = float(os.environ.get("PARITY_IMG_TOL", 5e-4))
GRAD_TOL = float(os.environ.get("PARITY_GRAD_TOL", 3e-3))


def run(n=None, res=None, seed=None, quiet=False):
    from bench import build
    from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

    n = n or int(os.environ.get("PARITY_N", 50_000))
    res = res or int(os.environ.get("PARITY_RES", 512))
    seed = seed if seed is not None else int(os.environ.get("PARITY_SEED", 0))

    arrs, cam, cfg = build(n, res, res, seed=seed)
    bg = jnp.zeros(3, jnp.float32)
    cfg_pallas = cfg._replace(use_pallas=True)
    cfg_jnp = cfg._replace(use_pallas=False,
                           lmax_per_tile=max(cfg.lmax_per_tile, 4096))

    def loss_fn(cfg_):
        def f(means, scales, quats, opac, colors):
            img, aux = rasterize(means, scales, quats, opac, colors, bg, cam, cfg_)
            # Weighted sums exercise every pixel/channel with distinct cotangents.
            hw = jnp.arange(img.size, dtype=jnp.float32).reshape(img.shape)
            return jnp.sum(img * jnp.sin(hw * 0.37)) + 0.5 * jnp.sum(aux.alpha)
        return f

    def fwd(cfg_):
        img, aux = jax.jit(lambda a: rasterize(*a, bg, cam, cfg_))(arrs)
        return np.asarray(img), int(aux.overflow)

    img_p, ov_p = fwd(cfg_pallas)
    img_j, ov_j = fwd(cfg_jnp)

    gp = jax.jit(jax.grad(loss_fn(cfg_pallas), argnums=(0, 1, 2, 3, 4)))(*arrs)
    gj = jax.jit(jax.grad(loss_fn(cfg_jnp), argnums=(0, 1, 2, 3, 4)))(*arrs)

    img_err = float(np.max(np.abs(img_p - img_j)))
    report = {"image_max_abs": img_err, "overflow": max(ov_p, ov_j)}
    ok = img_err <= IMG_TOL and ov_p == 0 and ov_j == 0
    names = ["means", "scales", "quats", "opacities", "colors"]
    for name, a, b in zip(names, gp, gj):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = float(np.max(np.abs(b))) + 1e-12
        rel = float(np.max(np.abs(a - b))) / scale
        report[f"grad_{name}_rel"] = rel
        ok = ok and rel <= GRAD_TOL

    report["ok"] = bool(ok)
    report["n"] = n
    report["res"] = res
    report["backend"] = jax.devices()[0].platform
    if not quiet:
        print(json.dumps(report))
    return report


if __name__ == "__main__":
    r = run()
    sys.exit(0 if r["ok"] else 1)
