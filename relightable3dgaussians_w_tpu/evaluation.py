"""Evaluation pipelines: test-embedding fitting, GT-envmap relighting eval,
white-light eval, and the half-image metric protocol.

TPU-native equivalents of the reference's `optimize_embeddings_test`
(relit3DGW_model.py:278-321), `eval_with_gt_envmaps.py` (best-of-51 sun-angle sweep
with masked PSNR), `eval_with_white_light.py`, and `metrics.py` (`evaluate_half`
protocol: embeddings fit on the LEFT half of each test image, metrics on the RIGHT).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from .config import Config
from .models import gaussians as G
from .models.nets import MLPNet
from .ops.rasterize import RasterizerConfig, CameraMatrices
from .renderer import render
from .train_step import forward_loss
from .utils import losses as LO
from .utils import envmap as EM


def left_half(img: jnp.ndarray) -> jnp.ndarray:
    """Left vertical half along width; images here are [H, W, ...] or [H, W]
    (reference get_half_images works on [C, H, W], general_utils.py:254-267)."""
    return img[:, : img.shape[1] // 2]


def right_half(img: jnp.ndarray) -> jnp.ndarray:
    return img[:, img.shape[1] // 2 :]


def optimize_test_embeddings(params, gauss_state, mlp: MLPNet, test_views,
                             cfg: Config, rcfg: RasterizerConfig,
                             init_embeddings: jnp.ndarray, iters: int | None = None,
                             seed: int = 0):
    """Fit per-test-image embeddings on the LEFT half of each test image with the
    L1+SSIM objective; all other parameters frozen (relit3DGW_model.py:278-321).

    Args:
        test_views: list of dicts with cam/image/sky_mask/occluders_mask (padded).
        init_embeddings: [T, D] initialization (AE-encoded or zeros/normal).
    Returns:
        [T, D] optimized embeddings.
    """
    o = cfg.optimizer
    iters = iters or o.optim_embeddings_test_iters
    bg = jnp.zeros(3, jnp.float32)
    W2 = rcfg.width // 2

    def loss_fn(emb, view_idx, cam, gt, sky, occ, key):
        e = emb[view_idx][None]
        envl, sky_sh = mlp.apply({"params": params["mlp"]}, e, deterministic=True)
        out = render(params["gaussians"], gauss_state, envl[0], sky_sh, cam, rcfg,
                     bg, sky, envlight_sh_degree=cfg.model.envlight_sh_degree,
                     sky_sh_degree=cfg.model.sky_sh_degree,
                     specular=cfg.model.specular, fix_sky=cfg.model.fix_sky,
                     debug=False)
        chw = lambda x: jnp.moveaxis(x, -1, 0)
        img_l = chw(out.render[:, :W2])
        gt_l = chw(gt[:, :W2])
        occ_l = jnp.broadcast_to(occ[None, :, :W2], img_l.shape)
        l1 = LO.l1_loss(img_l, gt_l, mask=occ_l)
        s = 1.0 - LO.ssim(img_l, gt_l, mask=occ_l)
        return l1 * (1 - o.lambda_dssim) + o.lambda_dssim * s

    tx = optax.adam(o.embeddings_lr)
    opt_state = tx.init(init_embeddings)
    emb = init_embeddings

    @jax.jit
    def step(emb, opt_state, view_idx, cam, gt, sky, occ, key):
        loss, grads = jax.value_and_grad(loss_fn)(emb, view_idx, cam, gt, sky, occ, key)
        updates, opt_state = tx.update(grads, opt_state, emb)
        return optax.apply_updates(emb, updates), opt_state, loss

    rng = np.random.RandomState(seed)
    stack: list[int] = []
    key = jax.random.PRNGKey(seed)
    for _ in range(iters):
        if not stack:
            stack = list(range(len(test_views)))
        i = stack.pop(rng.randint(len(stack)))
        v = test_views[i]
        key, k = jax.random.split(key)
        emb, opt_state, loss = step(emb, opt_state, jnp.asarray(i),
                                    v["cam"].matrices(), jnp.asarray(v["image"]),
                                    jnp.asarray(v["sky_mask"]),
                                    jnp.asarray(v["occluders_mask"]), k)
    return emb


class RelightResult(NamedTuple):
    image: np.ndarray
    best_angle: float
    psnr: float
    mae: float
    mse: float


def eval_view_with_gt_envmap(params, gauss_state, cfg: Config, rcfg: RasterizerConfig,
                             view, envmap_img: np.ndarray, eval_mask: np.ndarray,
                             init_rot=(0.0, 0.0, 0.0), sun_angle_range=(0.0, 2 * np.pi),
                             n_angles: int = 51, threshold: float = 0.999,
                             scale: float = 10.0, bg=None,
                             angle_batch: int = 17) -> RelightResult:
    """Relight one test view with its GT envmap: project to SH deg 4, apply the
    initial rotation, sweep `n_angles` sun rotations about y, keep the best masked
    PSNR (eval_with_gt_envmaps.py:51-136). fix_sky=True (white sky).

    The sweep is BATCHED: `angle_batch` rotations ride ONE rasterizer pass as 3*B
    fused color channels — the tile geometry, binning, and per-pixel alpha work
    are identical across sun angles (only the per-Gaussian shading differs), so the
    compositor shares them the same way it fuses AOV channels (SURVEY.md §7). The
    reference dispatches 51 independent full renders (eval_with_gt_envmaps.py
    :306-327); this runs ceil(51/17)=3 fused pipelines + one final render, ~12x
    less device work per view."""
    from functools import partial

    from .models import light as L
    from .utils.sh import eval_sh  # noqa: F401  (parity w/ compute_colors imports)

    img = EM.saturate_envmap(envmap_img, threshold, scale)
    coeffs = EM.project_envmap_to_sh(img, cfg.model.envlight_sh_degree)
    rz, ry, rx = init_rot[2], init_rot[1], init_rot[0]
    base0 = EM.rotate_sh(coeffs, yaw=rz, pitch=ry, roll=rx)

    bg = jnp.zeros(3, jnp.float32) if bg is None else bg
    sky_sh = jnp.zeros((1, (cfg.model.sky_sh_degree + 1) ** 2, 3), jnp.float32)
    cam = view["cam"].matrices()
    gt = jnp.asarray(view["image"])
    sky = jnp.asarray(view["sky_mask"])
    mask = jnp.asarray(eval_mask)

    @partial(jax.jit, static_argnames=("nb",))
    def sweep_group(bases, nb):
        """bases [nb, K, 3] -> masked PSNR [nb] (one fused rasterize)."""
        from .ops.rasterize import rasterize

        p = params["gaussians"]
        xyz = G.get_xyz(p, gauss_state)
        campos = cam.campos
        dir_pp_n = L.safe_normalize(xyz - campos[None, :])
        normal = G.get_normal(p, dir_pp_n)
        albedo, kr, km = G.get_albedo(p), G.get_roughness(p), G.get_metalness(p)

        def shade_one(base):
            shaded = L.shade(base, cfg.model.envlight_sh_degree, xyz, normal,
                             albedo, campos, kr, km, specular=cfg.model.specular)
            return jnp.where(gauss_state.is_sky[:, None], 1.0, shaded.rgb)  # fix_sky

        colors = jax.vmap(shade_one)(bases)                   # [nb, N, 3]
        colors = jnp.moveaxis(colors, 0, 1).reshape(xyz.shape[0], nb * 3)
        bgs = jnp.tile(bg, (nb,))
        image, _ = rasterize(xyz, G.get_scaling(p), G.get_rotation(p),
                             G.get_opacity(p, gauss_state), colors, bgs, cam, rcfg,
                             active=gauss_state.alive)
        ims = jnp.clip(image.reshape(image.shape[0], image.shape[1], nb, 3), 0, 1)
        se = jnp.sum((ims - gt[:, :, None, :]) ** 2 * mask[:, :, None, None],
                     axis=(0, 1, 3))
        mse = se / (jnp.sum(mask) * 3 + 1e-10)
        return LO.mse2psnr(mse)

    angles = np.linspace(sun_angle_range[0], sun_angle_range[1], n_angles)
    bases = np.stack([EM.rotate_sh(base0, pitch=float(a)) for a in angles])
    nb = min(angle_batch, n_angles)
    psnrs = []
    for i in range(0, n_angles, nb):
        group = bases[i : i + nb]
        if len(group) < nb:  # pad to keep ONE jit specialization
            group = np.concatenate([group, np.repeat(group[-1:], nb - len(group), 0)])
        psnrs.append(np.asarray(sweep_group(jnp.asarray(group), nb)))
    psnrs = np.concatenate(psnrs)[:n_angles]
    best_i = int(np.argmax(psnrs))
    angle = float(angles[best_i])

    # Final render at the winning angle (also yields the returned image).
    out = render(params["gaussians"], gauss_state, jnp.asarray(bases[best_i]),
                 sky_sh, cam, rcfg, bg, sky,
                 envlight_sh_degree=cfg.model.envlight_sh_degree,
                 sky_sh_degree=cfg.model.sky_sh_degree,
                 specular=cfg.model.specular, fix_sky=True, debug=False)
    image = np.asarray(jnp.clip(out.render, 0.0, 1.0))
    chw_j = jnp.moveaxis(jnp.asarray(image), -1, 0)
    gtc_j = jnp.moveaxis(gt, -1, 0)
    psnr = float(LO.mse2psnr(LO.img2mse(chw_j, gtc_j, mask=mask[None])))
    chw = np.moveaxis(image, -1, 0)
    gtc = np.moveaxis(np.asarray(gt), -1, 0)
    m = np.asarray(mask)[None]
    mae = float(np.sum(np.abs(chw - gtc) * m) / (m.sum() * 3 + 1e-6))
    mse = float(np.sum((chw - gtc) ** 2 * m) / (m.sum() * 3 + 1e-6))
    return RelightResult(image=image, best_angle=angle, psnr=psnr, mae=mae, mse=mse)


def eval_white_light(params, gauss_state, cfg: Config, rcfg: RasterizerConfig, view,
                     bg=None):
    """Render under uniform white light (eval_with_white_light.py): DC-only SH whose
    degree-0 irradiance is 1."""
    # C4 * base0 = 1  =>  base0 = 1 / 0.886227 per channel.
    base = jnp.zeros(((cfg.model.envlight_sh_degree + 1) ** 2, 3), jnp.float32)
    base = base.at[0].set(1.0 / 0.886227)
    sky_sh = jnp.zeros((1, (cfg.model.sky_sh_degree + 1) ** 2, 3), jnp.float32)
    bg = jnp.zeros(3, jnp.float32) if bg is None else bg
    out = render(params["gaussians"], gauss_state, base, sky_sh,
                 view["cam"].matrices(), rcfg, bg, jnp.asarray(view["sky_mask"]),
                 envlight_sh_degree=cfg.model.envlight_sh_degree,
                 sky_sh_degree=cfg.model.sky_sh_degree,
                 specular=cfg.model.specular, fix_sky=True, debug=False)
    return np.clip(np.asarray(out.render), 0, 1)


def evaluate_half_metrics(renders: list[np.ndarray], gts: list[np.ndarray],
                          lpips_fn=None) -> dict:
    """Right-half PSNR/SSIM(/LPIPS) — the novel-view protocol paired with left-half
    embedding fitting (metrics.py:145-209)."""
    psnrs, ssims, lpips_vals = [], [], []
    for im, gt in zip(renders, gts):
        im_r = jnp.moveaxis(jnp.asarray(right_half(im)), -1, 0)
        gt_r = jnp.moveaxis(jnp.asarray(right_half(gt)), -1, 0)
        psnrs.append(float(LO.psnr(im_r, gt_r)))
        ssims.append(float(LO.ssim(im_r, gt_r)))
        if lpips_fn is not None:
            lpips_vals.append(float(lpips_fn(im_r, gt_r)))
    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims))}
    if lpips_vals:
        out["lpips"] = float(np.mean(lpips_vals))
    return out
