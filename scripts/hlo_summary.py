"""Compile the composed render-backward on TPU and summarize the optimized HLO:
op histogram by estimated output bytes — finds the structural cost the stage
profiles can't see (duplicated subgraphs, giant scatters, odd layouts).

Usage: python scripts/hlo_summary.py [n] [res]
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f64": 8,
               "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str):
    total = 0
    for m in SHAPE_RE.finditer(shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(n=500_000, res=800):
    from relightable3dgaussians_w_tpu.config import Config
    from relightable3dgaussians_w_tpu.models import gaussians as G
    from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.renderer import render
    from __graft_entry__ import _camera

    rng = np.random.RandomState(0)
    cam = _camera(res, res)
    pts = np.stack([rng.uniform(-2.5, 2.5, n), rng.uniform(-2.5, 2.5, n),
                    rng.uniform(1.0, 10.0, n)], -1).astype(np.float32)
    capacity = ((n + 4095) // 4096) * 4096
    params_g, gstate = G.init_from_points(pts, np.full(n, 5e-5, np.float32), capacity)
    envl = jnp.asarray(rng.uniform(0, 0.4, (25, 3)), jnp.float32)
    sky_sh = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 4, 3)), jnp.float32)
    sky_mask = jnp.ones((res, res))
    bg3 = jnp.zeros(3)

    rcfg = RasterizerConfig(width=res, height=res, max_dup=1 << 20,
                            max_tiles_per_gauss=0, lmax_per_tile=4096, tile_chunk=8,
                            use_pallas=jax.default_backend() == "tpu")

    target = os.environ.get("HLO_TARGET", "render")
    if target == "render":
        def f(pg):
            out = render(pg, gstate, envl, sky_sh, cam, rcfg, bg3, sky_mask,
                         envlight_sh_degree=4, sky_sh_degree=1, specular=True,
                         fix_sky=False, debug=False)
            return jnp.sum(out.render)

        lowered = jax.jit(jax.grad(f)).lower(params_g)
    elif target == "rast":
        from relightable3dgaussians_w_tpu.ops.rasterize import rasterize
        from relightable3dgaussians_w_tpu.renderer import compute_colors

        xyz = G.get_xyz(params_g, gstate)
        scales = G.get_scaling(params_g)
        quats = G.get_rotation(params_g)
        opac = G.get_opacity(params_g, gstate)
        colors13 = jax.jit(lambda p: compute_colors(
            p, gstate, envl, sky_sh, 4, 1, cam.campos, True, False, False)[0])(params_g)
        bg13 = jnp.zeros(13)

        def f(x, s, q, o, c):
            img, aux = rasterize(x, s, q, o, c, bg13, cam, rcfg, active=gstate.alive)
            return jnp.sum(img)

        lowered = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4))).lower(
            xyz, scales, quats, opac, colors13)
    elif target == "rast_o":
        # Leaves except opacity activated inside — isolates the +67ms anomaly.
        from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

        xyz = G.get_xyz(params_g, gstate)
        scales = G.get_scaling(params_g)
        quats = G.get_rotation(params_g)
        colors13 = jnp.zeros((capacity, 13))
        bg13 = jnp.zeros(13)

        def f(pg, x, s, q, c):
            o = G.get_opacity(pg, gstate)
            img, aux = rasterize(x, s, q, o, c, bg13, cam, rcfg, active=gstate.alive)
            return jnp.sum(img)

        lowered = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3, 4))).lower(
            params_g, xyz, scales, quats, colors13)
    else:  # colors
        from relightable3dgaussians_w_tpu.renderer import compute_colors

        def f(pg):
            c, _ = compute_colors(pg, gstate, envl, sky_sh, 4, 1, cam.campos,
                                  True, False, False)
            return jnp.sum(c)

        lowered = jax.jit(jax.grad(f)).lower(params_g)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"HLO text: {len(txt) / 1e6:.1f} MB, lines {txt.count(chr(10))}")
    dump = os.environ.get("HLO_DUMP")
    if dump:
        with open(dump, "w") as fh:
            fh.write(txt)

    by_op = defaultdict(lambda: [0, 0])
    lines = []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"%?[\w.\-]+ = (\S+) (\w+)\(", ls)
        if not m:
            continue
        shape_str, op = m.group(1), m.group(2)
        b = shape_bytes(shape_str)
        by_op[op][0] += 1
        by_op[op][1] += b
        if b > 16 << 20:
            lines.append((b, ls[:180]))

    print("\n== op histogram (count, total output MB) ==")
    for op, (c, b) in sorted(by_op.items(), key=lambda kv: -kv[1][1])[:20]:
        print(f"{op:28s} {c:6d} {b / 1e6:12.1f} MB")

    print("\n== individual ops with output > 16 MB ==")
    for b, ls in sorted(lines, reverse=True)[:40]:
        print(f"{b / 1e6:9.1f} MB  {ls}")

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print("\n== cost analysis ==")
        for k in sorted(ca):
            if "flops" in k or "bytes" in k or "optimal" in k:
                print(f"{k}: {ca[k]:.3e}")
    except Exception as e:  # noqa: BLE001
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    main(n, res)
