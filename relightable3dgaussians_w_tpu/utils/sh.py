"""Real spherical-harmonics math (degrees 0–5), pure jnp.

TPU-native equivalent of the reference's SH layer (`utils/sh_utils.py:35-187` in the
reference repo): hardcoded real SH basis evaluation, RGB<->SH DC conversion, the
Gauss–Weierstrass roughness-smoothing kernel, and gamma correction. Everything is
shape-polymorphic over leading batch dims and differentiable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Toggleable for perf bisection; f32 is the correctness default (see eval_sh).
EVAL_SH_PRECISION = jax.lax.Precision.HIGHEST

# Real SH basis constants Y_lm in Cartesian form (l<=5). Same numerical constants as
# the standard tables used by the reference (`utils/sh_utils.py:35-77`,
# cuda_rasterizer/auxiliary.h:22-39); degree-5 values follow Sloan, "Stupid SH Tricks".
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)
C5 = (
    -0.6563820568401703,
    8.302649259524165,
    -0.48923829943525043,
    4.793536784973324,
    -0.452946651195697,
    0.1169503224534236,
    -0.452946651195697,
    2.3967683924866,
    -0.48923829943525043,
    2.075662314881041,
    -0.6563820568401701,
)


def num_sh_coeffs(deg: int) -> int:
    return (deg + 1) ** 2


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis at unit directions.

    Args:
        deg: SH degree in [0, 5].
        dirs: [..., 3] unit directions.
    Returns:
        [..., (deg+1)**2] basis values, so that eval = sum_i basis_i * coeff_i.
    """
    assert 0 <= deg <= 5
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [C0 * one]
    if deg > 0:
        out += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        out += [
            C3[0] * y * (3 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4 * zz - xx - yy),
            C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
            C3[4] * x * (4 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3 * yy),
        ]
    if deg > 3:
        out += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3 * xx - yy),
            C4[2] * xy * (7 * zz - 1),
            C4[3] * yz * (7 * zz - 3),
            C4[4] * (zz * (35 * zz - 30) + 3),
            C4[5] * xz * (7 * zz - 3),
            C4[6] * (xx - yy) * (7 * zz - 1),
            C4[7] * xz * (xx - 3 * yy),
            C4[8] * (xx * (xx - 3 * yy) - yy * (3 * xx - yy)),
        ]
    if deg > 4:
        # NOTE: two degree-5 entries are corrected relative to the reference's table
        # (utils/sh_utils.py:138-150): m=-5 there is missing the factor y, and m=+1
        # uses +15 where the associated Legendre polynomial has +1 (its m=-1 twin is
        # correct). Both fixes are validated by the orthonormality quadrature test.
        # Degrees 0-4 (all the reference's training path uses) match it exactly.
        out += [
            C5[0] * y * (5 * xx * xx - 10 * yy * xx + yy * yy),
            C5[1] * xy * z * (xx - yy),
            C5[2] * y * (9 * zz - 1) * (3 * xx - yy),
            C5[3] * xy * z * (3 * zz - 1),
            C5[4] * y * (zz * (-14 + 21 * zz) + 1),
            C5[5] * z * (zz * (63 * zz - 70) + 15),
            C5[6] * x * (zz * (21 * zz - 14) + 1),
            C5[7] * z * (xx - yy) * (-1 + 3 * zz),
            C5[8] * x * (xx - 3 * yy) * (-1 + 9 * zz),
            C5[9] * z * (xx * (xx - 6 * yy) + yy * yy),
            C5[10] * x * (xx * (xx - 10 * yy) + 5 * yy * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-coefficient functions at unit directions.

    Matches the reference's `eval_sh` (`utils/sh_utils.py:81-151`) basis ordering.

    Args:
        deg: SH degree in [0, 5].
        sh: [..., C, (deg+1)**2] coefficients (extra trailing coeffs are ignored).
        dirs: [..., 3] unit directions, broadcastable against sh's batch dims.
    Returns:
        [..., C]
    """
    n = num_sh_coeffs(deg)
    assert sh.shape[-1] >= n, (sh.shape, deg)
    basis = sh_basis(deg, dirs)  # [..., n]
    # f32 contraction: SH color evaluation feeds rendered colors and their
    # gradients; TPU's default bf16 einsum costs ~0.4% per-color noise that
    # compounds through training (r3 TPU selfcheck leg).
    return jnp.einsum("...cn,...n->...c", sh[..., :n], basis,
                      precision=EVAL_SH_PRECISION)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5


def band_index_per_coeff(deg: int) -> np.ndarray:
    """Static map: flat SH coefficient index -> band l (l = floor(sqrt(i)))."""
    return np.floor(np.sqrt(np.arange(num_sh_coeffs(deg)))).astype(np.int32)


def gauss_kernel(roughness: jnp.ndarray, sh_degree: int) -> jnp.ndarray:
    """Gauss–Weierstrass smoothing kernel in the SH domain.

    Per-band attenuation exp(-l(l+1) * 0.3 * roughness), broadcast over all m within a
    band (reference `utils/sh_utils.py:162-181`). Vectorized via a static coeff->band
    gather instead of the reference's per-band python loop.

    Args:
        roughness: [..., 1] roughness.
        sh_degree: SH degree.
    Returns:
        [..., (sh_degree+1)**2] kernel coefficients.
    """
    l_per_coeff = jnp.asarray(band_index_per_coeff(sh_degree), dtype=roughness.dtype)
    ll1 = l_per_coeff * (l_per_coeff + 1.0)  # [(deg+1)**2]
    return jnp.exp(-ll1 * (0.3 * roughness))


def gamma_correction(rgb: jnp.ndarray, gamma: float = 2.2) -> jnp.ndarray:
    """Clamp to [0,1], add 1e-4, and apply power 1/gamma (reference sh_utils.py:184-187)."""
    rgb = jnp.clip(rgb, 0.0, 1.0) + 1e-4
    return rgb ** (1.0 / gamma)
