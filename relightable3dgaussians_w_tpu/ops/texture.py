"""Differentiable bilinear texture sampling, pure jnp.

TPU-native replacement for the reference's `dr.texture(..., filter_mode='linear',
boundary_mode='clamp')` (nvdiffrast CUDA; used for the 256x256x2 split-sum FG LUT
lookup in scene/NVDIFFREC/light.py:41,170). A clamped bilinear gather is trivially
XLA-native (SURVEY.md §2.1 nvdiffrast row).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a texture bilinearly with clamped borders.

    Follows the texel-center convention of nvdiffrast: uv in [0,1]^2 maps texel i's
    center to (i + 0.5) / size; u indexes width, v indexes height.

    Args:
        tex: [H, W, C] texture.
        uv: [..., 2] coordinates (u, v).
    Returns:
        [..., C]
    """
    H, W = tex.shape[0], tex.shape[1]
    u = uv[..., 0] * W - 0.5
    v = uv[..., 1] * H - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    u0r = u0.astype(jnp.int32)
    v0r = v0.astype(jnp.int32)
    u0i = jnp.clip(u0r, 0, W - 1)
    u1i = jnp.clip(u0r + 1, 0, W - 1)
    v0i = jnp.clip(v0r, 0, H - 1)
    v1i = jnp.clip(v0r + 1, 0, H - 1)
    t00 = tex[v0i, u0i]
    t01 = tex[v0i, u1i]
    t10 = tex[v1i, u0i]
    t11 = tex[v1i, u1i]
    fu = fu[..., None]
    fv = fv[..., None]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )
