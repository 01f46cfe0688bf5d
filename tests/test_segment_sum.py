"""Parity: Pallas segment-sum kernel vs jnp twin (fwd), and gather_rows_t grads."""

import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.ops.pallas.segment_sum import (
    segment_sum_rows, segment_sum_rows_jnp, gather_rows_t)

INTERPRET = jax.default_backend() == "cpu"


def test_segment_sum_rows_matches_jnp():
    rng = np.random.RandomState(0)
    n, d, f = 700, 8192, 9
    rows = [jnp.asarray(rng.randn(d).astype(np.float32)) for _ in range(f)]
    ids = jnp.asarray(rng.randint(0, n, d).astype(np.int32))
    out = segment_sum_rows(rows, ids, n, block=128,
                           interpret=INTERPRET)[:n, :f]
    ref = segment_sum_rows_jnp(rows, ids, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_segment_sum_skewed_ids():
    # Heavily skewed segment sizes (one hot segment + empties) exercise the
    # chunk-range rounding and the empty-block path.
    rng = np.random.RandomState(1)
    n, d, f = 520, 4096, 3
    ids_np = np.where(rng.rand(d) < 0.7, 3, rng.randint(0, n, d)).astype(np.int32)
    rows = [jnp.asarray(rng.randn(d).astype(np.float32)) for _ in range(f)]
    ids = jnp.asarray(ids_np)
    out = segment_sum_rows(rows, ids, n, block=128,
                           interpret=INTERPRET)[:n, :f]
    ref = segment_sum_rows_jnp(rows, ids, n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4)


def test_gather_rows_t_grad_matches_autodiff():
    rng = np.random.RandomState(2)
    n, d, f_used, f_pad = 300, 4096, 9, 16
    pack = np.zeros((n, f_pad), np.float32)
    pack[:, :f_used] = rng.randn(n, f_used)
    gid = jnp.asarray(rng.randint(0, n, d).astype(np.int32))
    cot = jnp.asarray(rng.randn(f_pad, d).astype(np.float32))
    # Zero cotangent rows past f_used (the composite backward writes zeros there).
    cot = cot.at[f_used:].set(0.0)

    def via_pallas(p):
        return jnp.vdot(gather_rows_t(p, gid, n, f_used, INTERPRET), cot)

    def via_xla(p):
        return jnp.vdot(p[gid].T, cot)

    g1 = jax.grad(via_pallas)(jnp.asarray(pack))
    g2 = jax.grad(via_xla)(jnp.asarray(pack))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)
