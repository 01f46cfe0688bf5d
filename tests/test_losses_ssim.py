"""SSIM parity against a direct 2D-outer-product-window numpy implementation of
the reference's masked SSIM (loss_utils.py:42-99) — guards the shifted-add
separable blur rewrite (utils/losses.py _blur)."""

import numpy as np
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.utils.losses import ssim, gaussian_window_1d


def _ssim_reference_np(img1, img2, window_size=11, mask=None):
    win1d = np.asarray(gaussian_window_1d(window_size), np.float64)
    w2d = np.outer(win1d, win1d)  # the reference's full 2D window
    pad = window_size // 2

    def conv2(x):
        C, H, W = x.shape
        xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
        out = np.zeros_like(x, np.float64)
        for i in range(window_size):
            for j in range(window_size):
                out += w2d[i, j] * xp[:, i:i + H, j:j + W]
        return out

    mu1, mu2 = conv2(img1), conv2(img2)
    s1 = conv2(img1 * img1) - mu1 * mu1
    s2 = conv2(img2 * img2) - mu2 * mu2
    s12 = conv2(img1 * img2) - mu1 * mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    m = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / (
        (mu1 * mu1 + mu2 * mu2 + C1) * (s1 + s2 + C2))
    if mask is None:
        return m.mean()
    mask = np.broadcast_to(mask, m.shape)
    return (m * mask).sum() / np.maximum(mask.sum(), 1)


def test_ssim_matches_2d_window_reference():
    rng = np.random.RandomState(0)
    a = rng.uniform(0, 1, (3, 40, 52)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ref = _ssim_reference_np(a.astype(np.float64), b.astype(np.float64))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, ref, atol=2e-5)

    mask = (rng.uniform(size=(1, 40, 52)) > 0.4).astype(np.float32)
    ref_m = _ssim_reference_np(a.astype(np.float64), b.astype(np.float64), mask=mask)
    got_m = float(ssim(jnp.asarray(a), jnp.asarray(b), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got_m, ref_m, atol=2e-5)
