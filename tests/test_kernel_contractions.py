"""Accuracy pin for the kernels' 2-term Dekker contraction (_contract_lanes2):
it replaced precision=HIGHEST f32 matmuls on the composite's gradient/color
paths (exp_r4g: 6 MXU passes -> ~2), and must stay within the ~2^-16 budget the
parity thresholds assume. Runs the XLA lowering (CPU); the Mosaic lowering is
covered by the TPU parity probe (scripts/tpu_parity.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.ops.pallas.tile_composite import (
    _contract_lanes, _contract_lanes2, _dekker2)


def test_contract_lanes2_accuracy():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(256, 512).astype(np.float32) * rng.lognormal(
        0, 2, (256, 512)).astype(np.float32))
    b = jnp.asarray(rng.randn(13, 512).astype(np.float32))
    ref = np.asarray(jax.jit(_contract_lanes)(a, b), np.float64)
    out = np.asarray(jax.jit(_contract_lanes2)(a, b), np.float64)
    scale = np.abs(a)[:, None, :] * np.abs(b)[None, :, :]
    denom = np.maximum(scale.sum(-1), 1e-20)      # |a||b| row-col mass
    rel = np.abs(out - ref) / denom
    # ~2^-17 claimed; 2^-16 leaves margin while still failing if a Dekker
    # cross-term is silently dropped (a 1-term plain-bf16 contraction lands at
    # ~2^-8 on this distribution) — ADVICE r4.
    assert rel.max() < 2.0 ** -16, rel.max()


def test_dekker2_reconstructs():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32) * 1e3)
    d = _dekker2(x, 0)
    back = d[:64].astype(jnp.float32) + d[64:].astype(jnp.float32)
    rel = np.abs(np.asarray(back) - np.asarray(x)) / np.maximum(
        np.abs(np.asarray(x)), 1e-20)
    assert rel.max() < 2.0 ** -15, rel.max()
