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


def pack_bilinear_quads(tex):
    """[H, W, C] -> [H, W, 4C] where quad[v, u] = (t00, t01, t10, t11) with
    clamped +1 neighbors — turns the 4 taps of a bilinear sample into ONE row
    gather (4 separate per-element gathers at ~500k queries cost ~15 ms on v5e;
    one 4C-row gather ~4 ms). Works on numpy or jnp arrays."""
    xp = jnp if isinstance(tex, jnp.ndarray) else __import__("numpy")
    H, W = tex.shape[0], tex.shape[1]
    u1 = xp.minimum(xp.arange(W) + 1, W - 1)
    v1 = xp.minimum(xp.arange(H) + 1, H - 1)
    t01 = tex[:, u1]
    t10 = tex[v1, :]
    t11 = t10[:, u1]
    return xp.concatenate([tex, t01, t10, t11], axis=-1)


def bilinear_sample_packed(quad_tex: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """bilinear_sample against a pack_bilinear_quads texture: identical values
    (same taps, same combine), one gather instead of four.

    Args:
        quad_tex: [H, W, 4C] packed texture.
        uv: [..., 2].
    Returns:
        [..., C]
    """
    H, W = quad_tex.shape[0], quad_tex.shape[1]
    C = quad_tex.shape[2] // 4
    u = uv[..., 0] * W - 0.5
    v = uv[..., 1] * H - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    # Left/top border: bilinear_sample clamps BOTH taps to texel 0 there (the lerp
    # degenerates); the quad's +1 neighbor of clamped texel 0 is texel 1, so zero
    # the fraction instead — identical values and gradients.
    fu = jnp.where(u0 < 0, 0.0, u - u0)[..., None]
    fv = jnp.where(v0 < 0, 0.0, v - v0)[..., None]
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 1)
    q = quad_tex[v0i, u0i]  # [..., 4C]
    t00, t01, t10, t11 = q[..., :C], q[..., C:2 * C], q[..., 2 * C:3 * C], q[..., 3 * C:]
    return (
        t00 * (1 - fu) * (1 - fv)
        + t01 * fu * (1 - fv)
        + t10 * (1 - fu) * fv
        + t11 * fu * fv
    )
