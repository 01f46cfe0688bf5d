"""Training losses, pure jnp and jit-safe.

TPU-native equivalent of the reference's `utils/loss_utils.py`: masked L1, masked SSIM
(11x11 sigma-1.5 Gaussian window), sky/foreground depth separation, environment-light
non-negativity penalties, and the planar min-scale prior. All data-dependent branches of
the reference (empty-mask early returns, boolean indexing) are rewritten as masked
reductions with safe denominators so everything stays static-shaped under jit.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .sh import eval_sh
from .general import rand_hemisphere_dir

TINY_NUMBER = 1e-6


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(x)
    num = jnp.sum(mask == 1)
    return jnp.where(num > 0, jnp.sum(x * mask) / jnp.maximum(num, 1), 0.0)


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean |pred-gt|; with a {0,1} mask, sum over masked pixels / #masked
    (reference loss_utils.py:27-35)."""
    return _masked_mean(jnp.abs(pred - gt), mask)


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def gaussian_window_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, win: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """Depthwise separable 11x11 Gaussian blur with 'same' zero padding.

    The reference uses a full 2D window that is the outer product of the 1D Gaussian
    (loss_utils.py:47-51), so two separable 1D passes are mathematically identical.
    img: [C, H, W].

    Implemented as SHIFTED ADDS (11 slice+fma per axis) instead of
    conv_general_dilated: every product/add is elementwise f32, so SSIM's
    variance terms (sigma^2 = E[x^2] - mu^2, catastrophic cancellation) keep
    full precision on TPU — the default bf16 conv cost ~11 dB of training PSNR,
    while an f32-precision conv lowers ~75 ms/step slower at 800^2 on v5e
    (exp_r3e bisection). The unrolled fma chain is both exact and fast.
    """
    pad = window_size // 2

    def pass_along(x, axis):
        padw = [(0, 0)] * x.ndim
        padw[axis] = (pad, pad)
        xp = jnp.pad(x, padw)
        n = x.shape[axis]
        acc = None
        for k in range(window_size):
            sl = jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
            term = win[k] * sl
            acc = term if acc is None else acc + term
        return acc

    return pass_along(pass_along(img, 1), 2)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """SSIM with 11x11 sigma-1.5 Gaussian window and zero-padded borders, optionally
    averaged over a {0,1} mask (reference loss_utils.py:54-99).

    Args:
        img1, img2: [C, H, W] in [0, 1].
        mask: broadcastable to [C, H, W] or None.
    """
    win = jnp.asarray(gaussian_window_1d(window_size))
    mu1 = _blur(img1, win, window_size)
    mu2 = _blur(img2, win, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win, window_size) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win, window_size) - mu2_sq
    sigma12 = _blur(img1 * img2, win, window_size) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / ((mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    if mask is None:
        return jnp.mean(ssim_map)
    mask = jnp.broadcast_to(mask, ssim_map.shape)
    num = jnp.sum(mask == 1)
    return jnp.where(num > 0, jnp.sum(ssim_map * mask) / jnp.maximum(num, 1), 1.0)


def zero_one_loss(img: jnp.ndarray) -> jnp.ndarray:
    """Push values toward {0, 1} (reference loss_utils.py:102-106)."""
    eps = 1e-3
    val = jnp.clip(img, eps, 1 - eps)
    return jnp.mean(jnp.log(val) + jnp.log(1 - val))


def smoothing_depth_loss(depth_map: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1 distance between the depth map and its (stop-gradiented) 5x5 box blur
    (reference loss_utils.py:109-121, which blurs on the host with cv2).

    Args:
        depth_map: [H, W].
    """
    k = jnp.ones((1, 1, 5, 5), depth_map.dtype) / 25.0
    x = depth_map[None, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NCHW", "OIHW", "NCHW"))
    avg = jax.lax.conv_general_dilated(x, k, (1, 1), [(2, 2), (2, 2)],
                                       dimension_numbers=dn,
                                       precision=jax.lax.Precision.HIGHEST)[0, 0]
    avg = jax.lax.stop_gradient(avg)
    if mask is None:
        return jnp.mean(jnp.abs(depth_map - avg))
    num = jnp.sum(mask == 1)
    return jnp.where(num > 0, jnp.sum(jnp.abs(depth_map * mask - avg * mask)) / jnp.maximum(num, 1), 0.0)


def sky_depth_loss(depth_map: jnp.ndarray, sky_mask: jnp.ndarray, gamma: float = 0.02):
    """exp(-gamma*(mean sky-region depth - mean non-sky depth)) on the rendered depth
    map; non-sky mean is stop-gradiented (reference loss_utils.py:124-137; its
    sky_mask is 1 = NOT sky).

    Args:
        depth_map: [H, W]; sky_mask: [H, W] with 1 = not sky.
    """
    nosky = 1.0 - sky_mask
    n_sky = jnp.sum(nosky == 1)
    n_nosky = jnp.sum(sky_mask == 1)
    mean_nosky = jax.lax.stop_gradient(
        jnp.sum(depth_map * sky_mask) / jnp.maximum(n_nosky, 1))
    mean_sky = jnp.sum(depth_map * nosky) / jnp.maximum(n_sky, 1)
    loss = jnp.exp(-gamma * (mean_sky - mean_nosky))
    return jnp.where(n_sky > 0, loss, 0.0)


def depth_loss_gaussians(depths: jnp.ndarray, is_sky: jnp.ndarray, visible: jnp.ndarray, gamma: float = 0.02,
                         pool_axis: str | None = None) -> jnp.ndarray:
    """exp(-gamma * (mean depth of visible sky Gaussians - mean depth of visible
    foreground Gaussians)); fg mean is stop-gradiented (reference
    loss_utils.py:140-148). Functional form over per-Gaussian view depths.

    Args:
        depths: [N] view-space z per Gaussian.
        is_sky: [N] bool.
        visible: [N] bool (radii > 0).
        pool_axis: mesh axis name when the pool rows are sharded — the four
            sums are psum'd BEFORE the nonlinear exp so every device returns
            the global value.
    """
    sky_m = is_sky & visible
    fg_m = (~is_sky) & visible
    n_sky = jnp.sum(sky_m)
    n_fg = jnp.sum(fg_m)
    s_sky = jnp.sum(jnp.where(sky_m, depths, 0.0))
    s_fg = jnp.sum(jnp.where(fg_m, depths, 0.0))
    if pool_axis is not None:
        n_sky, n_fg, s_sky, s_fg = (jax.lax.psum(v, pool_axis)
                                    for v in (n_sky, n_fg, s_sky, s_fg))
    avg_sky = s_sky / jnp.maximum(n_sky, 1)
    avg_fg = jax.lax.stop_gradient(s_fg / jnp.maximum(n_fg, 1))
    loss = jnp.exp(-gamma * (avg_sky - avg_fg))
    return jnp.where((n_sky > 0) & (n_fg > 0), loss, 0.0)


def envlight_loss(key, envlight_sh: jnp.ndarray, sh_degree: int, normals: jnp.ndarray,
                  n_dirs: int = 1000, normals_subset_size: int = 100) -> jnp.ndarray:
    """Hemisphere-sampled negativity penalty on the SH environment light
    (reference loss_utils.py:151-182): sample cosine-weighted directions around a
    subset of normals, evaluate the light, clamp to the negative part, average, and
    square.

    Args:
        envlight_sh: [(deg+1)**2, 3] SH coefficients.
        normals: [N, 3].
    """
    k1, k2 = jax.random.split(key)
    n = normals.shape[0]
    take = min(normals_subset_size, n)
    idx = jax.random.choice(k1, n, shape=(take,), replace=False)
    normals = normals[idx]
    dirs = rand_hemisphere_dir(k2, n_dirs, normals)  # [take, n_dirs, 3]
    light = eval_sh(sh_degree, jnp.swapaxes(envlight_sh, 0, 1), dirs)  # [take, n_dirs, 3]
    light = jnp.minimum(light, 0.0)
    avg = jnp.mean(jnp.mean(light, axis=1), axis=0)
    return jnp.mean(avg**2)


def penalize_outside_range(x: jnp.ndarray, lower: float = 0.0, upper: float = 1.0) -> jnp.ndarray:
    """Mean squared violation below `lower` plus mean squared violation above `upper`,
    each normalized by its own violating count (reference loss_utils.py:199-207)."""
    below = jnp.minimum(x - lower, 0.0)
    above = jnp.maximum(x - upper, 0.0) if np.isfinite(upper) else jnp.zeros_like(x)
    n_below = jnp.sum(below < 0)
    n_above = jnp.sum(above > 0)
    e_below = jnp.where(n_below > 0, jnp.sum(below**2) / jnp.maximum(n_below, 1), 0.0)
    e_above = jnp.where(n_above > 0, jnp.sum(above**2) / jnp.maximum(n_above, 1), 0.0)
    return e_below + e_above


def envl_sh_loss(key, sh_env: jnp.ndarray, sh_degree: int, n_samples: int = 10) -> jnp.ndarray:
    """LumiGauss R+ constraint: evaluate the env SH at uniform random directions and
    penalize negative values (reference loss_utils.py:185-195).

    Args:
        sh_env: [(deg+1)**2, 3].
    """
    v = jax.random.uniform(key, (n_samples, 3), minval=-1.0, maxval=1.0)
    v = v / (jnp.linalg.norm(v, axis=1, keepdims=True) + 1e-12)
    vals = eval_sh(sh_degree, jnp.swapaxes(sh_env, 0, 1)[None], v)  # [n_samples, 3]
    return penalize_outside_range(vals.reshape(-1), 0.0, np.inf)


def min_scale_loss(scaling: jnp.ndarray, radii: jnp.ndarray, is_sky: jnp.ndarray,
                   pool_axis: str | None = None) -> jnp.ndarray:
    """Mean of the smallest scale over visible foreground Gaussians — the planar prior
    (reference loss_utils.py:210-220).

    pool_axis: mesh axis name when the pool rows are sharded (shard_map context);
    the masked mean's numerator/denominator are psum'd BEFORE the division so
    every device returns the global value."""
    m = (radii > 0) & (~is_sky)
    min_s = jnp.min(scaling, axis=-1)
    n = jnp.sum(m)
    num = jnp.sum(jnp.where(m, min_s, 0.0))
    if pool_axis is not None:
        n = jax.lax.psum(n, pool_axis)
        num = jax.lax.psum(num, pool_axis)
    return jnp.where(n > 0, num / jnp.maximum(n, 1), 0.0)


def img2mse(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean((x - y) ** 2)
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum((x - y) ** 2 * mask) / (jnp.sum(mask) + TINY_NUMBER)


def img2mae(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    if mask is None:
        return jnp.mean(jnp.abs(x - y))
    mask = jnp.broadcast_to(mask, x.shape)
    return jnp.sum(jnp.abs(x - y) * mask) / (jnp.sum(mask) + TINY_NUMBER)


def mse2psnr(x) -> jnp.ndarray:
    return -10.0 * jnp.log(x + TINY_NUMBER) / jnp.log(10.0)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    return mse2psnr(img2mse(img1, img2, mask))
