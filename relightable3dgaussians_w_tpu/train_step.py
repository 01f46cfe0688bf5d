"""Jitted training step: render -> loss stack -> Adam with per-group schedules.

TPU-native equivalent of the reference's per-iteration body (train.py:55-163) plus its
optimizer setup (relit3DGW_model.py:139-158, gaussian_model.py:259-293): one fused XLA
program per step instead of a Python-driven sequence of CUDA launches. The
screenspace-points gradient probe becomes an explicit differentiated argument; Adam
runs as optax.scale_by_adam(eps=1e-15) followed by per-leaf learning rates (xyz /
sky_angles on the log-lerp schedule, embeddings+mlp dropped to 2e-4 at iter 20k).
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .config import Config
from .models import gaussians as G
from .models.nets import MLPNet
from .ops.rasterize import RasterizerConfig, CameraMatrices
from .renderer import render, render_inputs, render_from_inputs, RenderInputs
from .utils import losses as LO
from .utils.general import expon_lr

SPATIAL_LR_SCALE = 5.0  # gaussian_model.py:183 hardcodes spatial_lr_scale = 5


class TrainState(NamedTuple):
    params: Any               # {"gaussians": GaussianParams, "mlp": ..., "embeddings": [M, D]}
    gauss_state: G.GaussianState
    opt_state: Any
    step: jnp.ndarray


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    psnr: jnp.ndarray
    radii: jnp.ndarray
    visibility: jnp.ndarray
    overflow: jnp.ndarray
    num_alive: jnp.ndarray


def make_lr_tree(params, step, ocfg, cap_mask_dtype=jnp.float32):
    """Per-leaf learning rates (training_setup groups, gaussian_model.py:264-281 +
    relit3DGW_model.py:143-158)."""
    o = ocfg
    xyz_lr = expon_lr(step, o.position_lr_init * SPATIAL_LR_SCALE,
                      o.position_lr_final * SPATIAL_LR_SCALE,
                      lr_delay_mult=o.position_lr_delay_mult,
                      max_steps=o.position_lr_max_steps)
    net_lr = jnp.where(step >= 20_000, 0.0002, o.mlp_lr)
    emb_lr = jnp.where(step >= 20_000, 0.0002, o.embeddings_lr)
    g_lrs = G.GaussianParams(
        xyz=xyz_lr,
        albedo=jnp.asarray(o.albedo_lr),
        opacity=jnp.asarray(o.opacity_lr),
        scaling=jnp.asarray(o.scaling_lr * SPATIAL_LR_SCALE),
        rotation=jnp.asarray(o.rotation_lr),
        roughness=jnp.asarray(o.roughness_lr),
        metalness=jnp.asarray(o.metalness_lr),
        sky_angles=xyz_lr,
        sky_radius=jnp.asarray(o.sky_radius_lr),
    )
    mlp_lrs = jax.tree_util.tree_map(lambda _: net_lr, params["mlp"])
    return {"gaussians": g_lrs, "mlp": mlp_lrs, "embeddings": emb_lr}


def make_optimizer():
    """Adam(eps=1e-15) moments; lr applied separately via make_lr_tree."""
    return optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15)


def grow_train_state(state: TrainState, new_capacity: int) -> TrainState:
    """Host-side pool growth: pad the Gaussian params, pool state, AND the Adam
    moments to `new_capacity` rows (zeros — exactly what fresh rows would carry).
    The TPU-native analog of the reference's unbounded cat_tensors_to_optimizer
    (gaussian_model.py:488-511): jit shapes change, so the next step re-compiles."""
    params_g, gstate = G.grow(state.params["gaussians"], state.gauss_state,
                              new_capacity)

    def grow_moments(m):
        g = m["gaussians"]
        cap = g.xyz.shape[0]
        pad = new_capacity - cap

        def padp(a):
            if getattr(a, "ndim", 0) == 0:
                return a
            return jnp.concatenate(
                [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

        return dict(m, gaussians=G.GaussianParams(*[padp(a) for a in g]))

    opt = state.opt_state._replace(mu=grow_moments(state.opt_state.mu),
                                   nu=grow_moments(state.opt_state.nu))
    return TrainState(dict(state.params, gaussians=params_g), gstate, opt, state.step)


def make_leaf_inputs(params, gauss_state: G.GaussianState, mlp: MLPNet,
                     cam: CameraMatrices, cam_uid, key, cfg: Config):
    """Stage A of the training step: params -> rasterizer leaf inputs.

    Embedding lookup, MLP (with dropout), envlight noise, activations, and
    Cook-Torrance shading. Deterministic given `key` (the split step re-runs it
    inside the VJP stage with the same key). Returns (RenderInputs, envlight_sh)
    where envlight_sh is the UN-noised MLP output (the R+ loss operates on it,
    train.py:99-102)."""
    k_noise, k_drop, _ = jax.random.split(key, 3)
    e = params["embeddings"][cam_uid][None]  # [1, D]
    envlight_sh, sky_sh = mlp.apply({"params": params["mlp"]}, e, deterministic=False,
                                    rngs={"dropout": k_drop})
    envlight_sh = envlight_sh[0]             # [(deg+1)^2, 3]
    noise = jax.random.normal(k_noise, envlight_sh.shape) * 0.025
    inp = render_inputs(
        params["gaussians"], gauss_state, envlight_sh + noise, sky_sh, cam,
        envlight_sh_degree=cfg.model.envlight_sh_degree,
        sky_sh_degree=cfg.model.sky_sh_degree,
        specular=cfg.model.specular, fix_sky=cfg.model.fix_sky, debug=False,
    )
    return inp, envlight_sh


def core_loss(inp: RenderInputs, envlight_sh, gauss_state: G.GaussianState,
              mean2d_probe, cam: CameraMatrices, gt_image, sky_mask,
              occluders_mask, key, step, cfg: Config, rcfg: RasterizerConfig,
              bg_color, raster_fn=None, pre=None, pool_axis: str | None = None,
              pool_axis_size: int = 1):
    """Stage B: rasterize the leaf inputs and evaluate the loss stack
    (train.py:78-113). Returns (loss, aux dict).

    pool_axis/pool_axis_size: set when running INSIDE a shard_map with the pool
    rows sharded over `pool_axis` (the fused data x gauss step,
    parallel/data_parallel.py). Every term is then computed with GLOBAL
    semantics (image terms see the gathered full image; pool-row regularizers
    psum their sums) and the returned loss is the global loss DIVIDED by the
    axis size — the caller psums it back, which makes every gradient exactly
    the single-device gradient: image-chain cotangents arrive once per device
    at 1/size scale and the all_gather transpose sums size copies; pool-row
    chains get size identical 1/size contributions."""
    o = cfg.optimizer
    _, _, k_envl = jax.random.split(key, 3)

    out = render_from_inputs(inp, gauss_state, cam, rcfg, bg_color, sky_mask,
                             debug=False, mean2d_probe=mean2d_probe,
                             raster_fn=raster_fn, pre=pre)

    # Losses operate in the reference's [C, H, W] layout.
    chw = lambda x: jnp.moveaxis(x, -1, 0)
    image = chw(out.render)
    gt = chw(gt_image)
    occ3 = jnp.broadcast_to(occluders_mask[None], image.shape)
    sky3 = jnp.broadcast_to(sky_mask[None], image.shape)

    # With pool_axis set, every image-space term is identical on each device
    # (they all see the gathered full image): scale by 1/size so the caller's
    # psum restores the global value exactly once (docstring).
    iw = 1.0 / pool_axis_size if pool_axis is not None else 1.0

    l1 = LO.l1_loss(image, gt, mask=occ3)
    ssim_v = 1.0 - LO.ssim(image, gt, mask=occ3)
    rec = l1 * (1 - o.lambda_dssim) + o.lambda_dssim * ssim_v
    loss = iw * rec

    # Sky-region BRDF suppression (train.py:86-87): mask = 1 - sky_mask selects sky.
    diff_c = chw(out.diffuse_color)
    spec_c = chw(out.specular_color)
    loss = loss + iw * o.lambda_sky_brdf * (
        LO.l1_loss(diff_c, jnp.zeros_like(diff_c), mask=1 - sky3)
        + LO.l1_loss(spec_c, jnp.zeros_like(spec_c), mask=1 - sky3)
    )

    # Normal consistency after reg_normal_from_iter (train.py:90-96).
    if o.lambda_normal > 0:
        rn = chw(out.normal) * occ3 * sky3
        rs = chw(out.normal_ref) * occ3 * sky3
        ncl = o.lambda_normal * jnp.mean(1.0 - jnp.sum(rn * rs, axis=0))
        loss = loss + iw * jnp.where(step > o.reg_normal_from_iter, ncl, 0.0)

    # Environment-light R+ constraint (train.py:99-102; added unweighted — the
    # reference's lambda_envlight only gates the term on/off).
    if o.lambda_envlight > 0:
        loss = loss + iw * LO.envl_sh_loss(k_envl, envlight_sh,
                                           cfg.model.envlight_sh_degree)

    # Planar prior (train.py:105-107). inp.scales == get_scaling(params), so the
    # gradient chains through the same exp in the input-VJP stage. With
    # pool_axis the masked mean is computed GLOBALLY inside (psum'd sums), then
    # scaled like every other term.
    if o.lambda_scale > 0:
        loss = loss + iw * o.lambda_scale * LO.min_scale_loss(
            inp.scales, out.radii, gauss_state.is_sky, pool_axis=pool_axis
        )

    # Sky/foreground Gaussian depth separation (train.py:110-113).
    if o.lambda_sky_gauss > 0:
        dl = o.lambda_sky_gauss * LO.depth_loss_gaussians(
            out.gauss_depth, gauss_state.is_sky, out.visibility_filter,
            pool_axis=pool_axis
        )
        loss = loss + iw * jnp.where(step > o.reg_sky_gauss_depth_from_iter, dl, 0.0)

    psnr = LO.psnr(image * occ3, gt * occ3)
    aux = dict(l1=l1, psnr=psnr, radii=out.radii, visibility=out.visibility_filter,
               overflow=out.overflow)
    return loss, aux


def forward_loss(params, gauss_state: G.GaussianState, mean2d_probe, mlp: MLPNet,
                 cam: CameraMatrices, gt_image, sky_mask, occluders_mask, cam_uid,
                 key, step, cfg: Config, rcfg: RasterizerConfig, bg_color,
                 raster_fn=None, pool_axis: str | None = None,
                 pool_axis_size: int = 1):
    """Fused loss stack (stage A + stage B in one graph). Returns (loss, aux)."""
    inp, envlight_sh = make_leaf_inputs(params, gauss_state, mlp, cam, cam_uid,
                                        key, cfg)
    return core_loss(inp, envlight_sh, gauss_state, mean2d_probe, cam, gt_image,
                     sky_mask, occluders_mask, key, step, cfg, rcfg, bg_color,
                     raster_fn=raster_fn, pool_axis=pool_axis,
                     pool_axis_size=pool_axis_size)


class TrainFns(NamedTuple):
    train_step: Any
    densify_step: Any
    densify_step_sized: Any   # with the post-3k screen-size threshold
    reset_opacity_step: Any


def make_train_fns(mlp: MLPNet, cfg: Config, rcfg: RasterizerConfig,
                   split_dispatch: bool = False,
                   sub_split_b: bool | None = None) -> TrainFns:
    """Build the jitted step functions for a fixed (mlp, config, raster-config).

    split_dispatch=True runs the step as THREE dispatches (leaf inputs; rasterize +
    losses + grads wrt leaves; input-chain VJP + Adam) instead of one fused
    program. Gradients are identical (the input stage is recomputed in the VJP
    stage with the same key); on v5e the fused program compiles to a ~2x slower
    schedule whenever the rasterizer's inputs are parameter expressions rather
    than program parameters (scripts/profile_seams.py — HLOs near-identical, cost
    isn't; root cause in XLA's scheduling, not in op counts)."""

    def _apply_update(state: TrainState, param_grads, probe_grad, loss, aux):
        adam = make_optimizer()
        updates, new_opt_state = adam.update(param_grads, state.opt_state, state.params)
        lrs = make_lr_tree(state.params, state.step, cfg.optimizer)
        updates = jax.tree_util.tree_map(lambda u, lr: -lr * u, updates, lrs)
        new_params = optax.apply_updates(state.params, updates)

        # Densification statistics with the reference's NDC-unit mean2D gradient
        # contract (backward.cu:460-461): pixel-space probe grads x (0.5*W, 0.5*H).
        ndc_grad = probe_grad * jnp.asarray([0.5 * rcfg.width, 0.5 * rcfg.height])
        new_gstate = G.add_densification_stats(state.gauss_state, ndc_grad,
                                               aux["visibility"], aux["radii"])

        # Binning-budget overflow poisons the render (segment contents shift,
        # ops/binning.py) and therefore every gradient: REJECT the whole update
        # in-graph (params, Adam moments, densify stats all keep their old values)
        # instead of silently applying a garbage step. The step counter still
        # advances (lr schedule). The reference never hits this (it resizes its key
        # buffer on device, rasterizer_impl.cu:280-285); the host trainer reacts to
        # the overflow counter at log time by growing max_dup + re-jitting.
        ok = aux["overflow"] == 0
        sel = lambda new, old: jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b) if getattr(a, "ndim", None) is not None else a,
            new, old)
        new_params = sel(new_params, state.params)
        new_opt_state = sel(new_opt_state, state.opt_state)
        new_gstate = sel(new_gstate, state.gauss_state)

        new_state = TrainState(new_params, new_gstate, new_opt_state, state.step + 1)
        step_aux = StepAux(
            loss=loss, l1=aux["l1"], psnr=aux["psnr"], radii=aux["radii"],
            visibility=aux["visibility"], overflow=aux["overflow"],
            num_alive=G.num_alive(new_gstate),
        )
        return new_state, step_aux

    def _train_step(state: TrainState, cam: CameraMatrices, gt_image, sky_mask,
                    occluders_mask, cam_uid, key, bg_color):
        n = state.gauss_state.alive.shape[0]
        probe = jnp.zeros((n, 2))

        (loss, aux), grads = jax.value_and_grad(forward_loss, argnums=(0, 2), has_aux=True)(
            state.params, state.gauss_state, probe, mlp, cam, gt_image, sky_mask,
            occluders_mask, cam_uid, key, state.step, cfg, rcfg, bg_color,
        )
        param_grads, probe_grad = grads
        return _apply_update(state, param_grads, probe_grad, loss, aux)

    # ---------------------------------------------------- split-dispatch stages
    #
    # Five dispatches: A (params -> leaf inputs), B1 (preprocess fwd), B2
    # (binning + gather + composite + loss, grads w.r.t. the STAGED preprocess
    # outputs and the direct leaf inputs), B3 (preprocess VJP), C (leaf-input
    # chain VJP + Adam). B was one dispatch in r2; staging the preprocess
    # outputs as program parameters inside it removes the same XLA scheduling
    # pathology the A/B/C split works around (ops/rasterize.py
    # make_rasterize_grad_split, BENCH_LOG.md r3).

    def _stage_a(params, gauss_state, cam, cam_uid, key):
        return make_leaf_inputs(params, gauss_state, mlp, cam, cam_uid, key, cfg)

    def _stage_b(inp, envlight_sh, gauss_state, cam, gt_image, sky_mask,
                 occluders_mask, key, step, bg_color):
        n = gauss_state.alive.shape[0]
        probe = jnp.zeros((n, 2))

        def f(inp, envlight_sh, probe):
            return core_loss(inp, envlight_sh, gauss_state, probe, cam, gt_image,
                             sky_mask, occluders_mask, key, step, cfg, rcfg,
                             bg_color)

        (loss, aux), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2), has_aux=True)(inp, envlight_sh, probe)
        return loss, aux, grads

    def _stage_b1(inp: RenderInputs, gauss_state, cam: CameraMatrices):
        from .ops.preprocess import preprocess

        return preprocess(
            inp.xyz, inp.scales, inp.quats, cam.viewmat, cam.projmat,
            cam.tan_fovx, cam.tan_fovy, rcfg.width, rcfg.height, rcfg.tile,
            rcfg.scale_modifier, None, gauss_state.alive, inp.opacity[:, 0],
        )

    def _stage_b2(pre, inp: RenderInputs, envlight_sh, gauss_state, cam,
                  gt_image, sky_mask, occluders_mask, key, step, bg_color):
        def f(mean2d, conic, depth, opacity, colors, scales, envl):
            p = pre._replace(mean2d=mean2d, conic=conic, depth=depth)
            inp2 = inp._replace(opacity=opacity, colors=colors, scales=scales)
            return core_loss(inp2, envl, gauss_state, None, cam, gt_image,
                             sky_mask, occluders_mask, key, step, cfg, rcfg,
                             bg_color, pre=p)

        (loss, aux), grads = jax.value_and_grad(
            f, argnums=(0, 1, 2, 3, 4, 5, 6), has_aux=True)(
                pre.mean2d, pre.conic, pre.depth, inp.opacity, inp.colors,
                inp.scales, envlight_sh)
        return loss, aux, grads

    def _stage_b3(inp: RenderInputs, gauss_state, cam, d_mean2d, d_conic,
                  d_depth):
        from .ops.preprocess import preprocess

        def f(xyz, scales, quats):
            p = preprocess(
                xyz, scales, quats, cam.viewmat, cam.projmat, cam.tan_fovx,
                cam.tan_fovy, rcfg.width, rcfg.height, rcfg.tile,
                rcfg.scale_modifier, None, gauss_state.alive,
                inp.opacity[:, 0],
            )
            return p.mean2d, p.conic, p.depth

        _, vjp = jax.vjp(f, inp.xyz, inp.scales, inp.quats)
        return vjp((d_mean2d, d_conic, d_depth))

    def _stage_c(state: TrainState, cam, cam_uid, key, d_inp, d_envl, probe_grad,
                 loss, aux):
        def inputs_fn(params):
            return make_leaf_inputs(params, state.gauss_state, mlp, cam, cam_uid,
                                    key, cfg)

        _, vjp = jax.vjp(inputs_fn, state.params)
        (param_grads,) = vjp((d_inp, d_envl))
        return _apply_update(state, param_grads, probe_grad, loss, aux)

    jit_a = jax.jit(_stage_a)
    jit_b = jax.jit(_stage_b)
    jit_b1 = jax.jit(_stage_b1)
    jit_b2 = jax.jit(_stage_b2)
    jit_b3 = jax.jit(_stage_b3)
    jit_c = jax.jit(_stage_c)

    # Default ON: with the shifted-add SSIM blur, staging the preprocess outputs
    # inside stage B measures 104.5 -> 99.0 ms/iter at 500k/800^2 on v5e
    # (BENCH_LOG r3; it was neutral only while the conv-pin regression masked it).
    if sub_split_b is None:
        import os as _os
        sub_split_b = _os.environ.get("TRAIN_SPLIT_B", "1") == "1"

    def _train_step_split3(state: TrainState, cam: CameraMatrices, gt_image,
                           sky_mask, occluders_mask, cam_uid, key, bg_color):
        inp, envl = jit_a(state.params, state.gauss_state, cam, cam_uid, key)
        loss, aux, (d_inp, d_envl, probe_grad) = jit_b(
            inp, envl, state.gauss_state, cam, gt_image, sky_mask,
            occluders_mask, key, state.step, bg_color)
        return jit_c(state, cam, cam_uid, key, d_inp, d_envl, probe_grad, loss, aux)

    def _train_step_split5(state: TrainState, cam: CameraMatrices, gt_image,
                           sky_mask, occluders_mask, cam_uid, key, bg_color):
        inp, envl = jit_a(state.params, state.gauss_state, cam, cam_uid, key)
        pre = jit_b1(inp, state.gauss_state, cam)
        loss, aux, (d_m2d, d_conic, d_depth, d_op, d_colors, d_scales_direct,
                    d_envl) = jit_b2(
            pre, inp, envl, state.gauss_state, cam, gt_image, sky_mask,
            occluders_mask, key, state.step, bg_color)
        d_xyz, d_scales_pre, d_quats = jit_b3(inp, state.gauss_state, cam,
                                              d_m2d, d_conic, d_depth)
        d_inp = RenderInputs(xyz=d_xyz, scales=d_scales_pre + d_scales_direct,
                             quats=d_quats, opacity=d_op, colors=d_colors)
        # The mean2d cotangent IS the densification probe gradient: the probe is
        # added to pre.mean2d inside the rasterizer, and mean2d's only other
        # consumers (tile rects) are derivative-dead floor/int chains.
        return jit_c(state, cam, cam_uid, key, d_inp, d_envl, d_m2d, loss, aux)

    _train_step_split = _train_step_split5 if sub_split_b else _train_step_split3

    def _densify(state: TrainState, key, grad_threshold, extent, max_screen_size):
        adam_state = state.opt_state
        mu_g, nu_g = adam_state.mu["gaussians"], adam_state.nu["gaussians"]
        params_g, gstate, (mu_g, nu_g), report = G.densify_and_prune(
            key, state.params["gaussians"], state.gauss_state, (mu_g, nu_g),
            grad_threshold, 0.005, extent, max_screen_size,
            percent_dense=cfg.optimizer.percent_dense,
        )
        new_opt = adam_state._replace(
            mu=dict(adam_state.mu, gaussians=mu_g),
            nu=dict(adam_state.nu, gaussians=nu_g),
        )
        return TrainState(dict(state.params, gaussians=params_g), gstate, new_opt, state.step), report

    def _reset_opacity(state: TrainState):
        adam_state = state.opt_state
        params_g, (mu_g, nu_g) = G.reset_opacity(
            state.params["gaussians"],
            (adam_state.mu["gaussians"], adam_state.nu["gaussians"]),
        )
        new_opt = adam_state._replace(
            mu=dict(adam_state.mu, gaussians=mu_g),
            nu=dict(adam_state.nu, gaussians=nu_g),
        )
        return TrainState(dict(state.params, gaussians=params_g), state.gauss_state,
                          new_opt, state.step)

    return TrainFns(
        train_step=_train_step_split if split_dispatch else jax.jit(_train_step),
        densify_step=jax.jit(partial(_densify, max_screen_size=None)),
        densify_step_sized=jax.jit(partial(_densify, max_screen_size=20)),
        reset_opacity_step=jax.jit(_reset_opacity),
    )
