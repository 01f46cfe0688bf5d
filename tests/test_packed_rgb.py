"""SERVING packed-RGB mode (RasterizerConfig.packed_rgb): the 8-row quantized
feature pack must composite EXACTLY like the plain Pallas path fed the
dequantized colors (the packing arithmetic is exact-f32 integers), and its
deviation from the exact-color render must respect the 12-bit quantization
bound. Fwd-only: the VJP refuses the mode. Interpret mode on CPU; the compiled
timing/deviation row lands in EXP_r05d.json via scripts/exp_r5c.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.ops.rasterize import rasterize
from relightable3dgaussians_w_tpu.ops.pallas.tile_composite import (
    PACK_LIM, PACK_LEVELS, pack_rb)

from test_rasterize import make_scene


def _pallas(cfg, **kw):
    return cfg._replace(use_pallas=True,
                        pallas_interpret=jax.default_backend() == "cpu",
                        pallas_chunk=128, **kw)


def _dequant(colors):
    rb, g = pack_rb(colors)
    q_r = jnp.floor(rb * (1.0 / 4096.0))
    q_b = rb - q_r * 4096.0
    step = PACK_LIM / PACK_LEVELS
    return jnp.stack([q_r * step, g, q_b * step], axis=-1)


@pytest.mark.parametrize("seed", [0, 3])
def test_packed_matches_dequantized_plain_path_bitwise(seed):
    arrs, cam, cfg, host = make_scene(n=300, seed=seed)
    cfg_p = _pallas(cfg)
    img_packed, aux_packed = rasterize(
        **arrs, cam=cam, cfg=cfg_p._replace(packed_rgb=True))
    deq = dict(arrs, colors=_dequant(arrs["colors"]))
    img_deq, aux_deq = rasterize(**deq, cam=cam, cfg=cfg_p)
    # Same kernel, same alpha math, colors dequantized identically in-kernel
    # and on host -> bitwise equal images and alpha.
    assert np.array_equal(np.asarray(img_packed), np.asarray(img_deq))
    assert np.array_equal(np.asarray(aux_packed.alpha), np.asarray(aux_deq.alpha))
    assert int(aux_packed.overflow) == 0


def test_packed_error_bound_vs_exact():
    arrs, cam, cfg, host = make_scene(n=300, seed=1)
    cfg_p = _pallas(cfg)
    img_exact, _ = rasterize(**arrs, cam=cam, cfg=cfg_p)
    img_packed, _ = rasterize(**arrs, cam=cam, cfg=cfg_p._replace(packed_rgb=True))
    # Compositing is a convex combination of entry colors plus bg (bg exact), so
    # per-channel error is bounded by the per-entry quantization half-step.
    bound = PACK_LIM / PACK_LEVELS / 2 + 1e-6
    err = np.abs(np.asarray(img_packed) - np.asarray(img_exact))
    assert err.max() <= bound, (err.max(), bound)
    assert err[..., 1].max() <= 1e-6  # G rides exact


def test_packed_hdr_clamp_and_range():
    # Colors beyond PACK_LIM clamp (serving display saturates far earlier);
    # packing stays exact-integer f32 through the full range.
    c = jnp.asarray([[0.0, -0.5, 12.0], [PACK_LIM, 1.0, PACK_LIM - 1e-4]],
                    jnp.float32)
    deq = np.asarray(_dequant(c))
    assert deq[0, 0] == 0.0 and deq[0, 2] == PACK_LIM  # clamped at the top
    assert abs(deq[1, 2] - (PACK_LIM - 1e-4)) <= PACK_LIM / PACK_LEVELS / 2 + 1e-6
    assert deq[0, 1] == -0.5  # G passes through untouched


def test_packed_refuses_gradients():
    arrs, cam, cfg, host = make_scene(n=100, seed=2)
    cfg_p = _pallas(cfg)._replace(packed_rgb=True)

    def loss(colors):
        img, _ = rasterize(**dict(arrs, colors=colors), cam=cam, cfg=cfg_p)
        return jnp.sum(img)

    with pytest.raises(Exception):
        jax.grad(loss)(arrs["colors"])
