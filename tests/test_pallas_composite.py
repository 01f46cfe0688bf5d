"""Pallas tile-compositing kernels vs the jnp compositor (interpret mode on CPU; the
same comparisons run compiled on a real TPU via bench/driver runs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.ops.rasterize import rasterize

from test_rasterize import make_scene


def _cfgs(cfg):
    return cfg, cfg._replace(use_pallas=True,
                             pallas_interpret=jax.default_backend() == "cpu",
                             pallas_chunk=128)


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_forward_matches_jnp(seed):
    arrs, cam, cfg, host = make_scene(n=300, seed=seed)
    cfg_j, cfg_p = _cfgs(cfg)
    img_j, aux_j = rasterize(**arrs, cam=cam, cfg=cfg_j)
    img_p, aux_p = rasterize(**arrs, cam=cam, cfg=cfg_p)
    err = np.abs(np.asarray(img_p) - np.asarray(img_j))
    # log-space transmittance can flip the single entry crossing the 1e-4
    # termination threshold; allow a tiny fraction of pixels off.
    assert (err > 1e-3).mean() < 1e-3, err.max()
    assert np.median(err) < 1e-5
    aerr = np.abs(np.asarray(aux_p.alpha) - np.asarray(aux_j.alpha))
    assert (aerr > 1e-3).mean() < 1e-3


def test_prefix_exact_error_bound():
    """The 2-pass Dekker triangular prefix must stay within ~2^-16 relative of f64
    over the value range the compositor feeds it (log1m in [-4.7, 0], wc spanning
    gradient scales) — the bound the include/termination analysis relies on
    (ops/pallas/tile_composite.py _dot_exact_rhs)."""
    from relightable3dgaussians_w_tpu.ops.pallas.tile_composite import _prefix_exact

    rng = np.random.RandomState(0)
    for scale, chunk in [(4.7, 256), (1e-2, 256), (37.0, 512), (4.7, 128)]:
        x = jnp.asarray(-rng.uniform(0, scale, (64, chunk)).astype(np.float32))
        for strict in (True, False):
            got = np.asarray(_prefix_exact(x, strict)).astype(np.float64)
            xs = np.asarray(x).astype(np.float64)
            ref = np.cumsum(xs, axis=1)
            if strict:
                ref = ref - xs
            denom = np.maximum(np.abs(ref), scale)  # absolute floor at the term scale
            rel = (np.abs(got - ref) / denom).max()
            assert rel < 2.0 ** -15, (scale, chunk, strict, rel)


def test_pallas_backward_matches_jnp():
    arrs, cam, cfg, host = make_scene(n=200, seed=2)
    cfg_j, cfg_p = _cfgs(cfg)
    key = jax.random.PRNGKey(0)
    wimg = jax.random.normal(key, (host["H"], host["W"], 3))
    walpha = jax.random.normal(jax.random.fold_in(key, 1), (host["H"], host["W"]))

    def loss(c, means3d, scales, quats, opacities, colors, bg):
        img, aux = rasterize(means3d, scales, quats, opacities, colors, bg, cam, c)
        return jnp.sum(img * wimg) + jnp.sum(aux.alpha * walpha)

    names = ("means3d", "scales", "quats", "opacities", "colors", "bg")
    args = [arrs[k] for k in names]
    g_j = jax.grad(lambda *a: loss(cfg_j, *a), argnums=tuple(range(6)))(*args)
    g_p = jax.grad(lambda *a: loss(cfg_p, *a), argnums=tuple(range(6)))(*args)
    for nm, gr, gp in zip(names, g_j, g_p):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = max(np.abs(gr).max(), 1e-6)
        rel = np.abs(gp - gr).max() / scale
        assert rel < 5e-3, f"{nm}: max rel err {rel}"
