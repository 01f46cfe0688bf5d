"""Camera-batched data-parallel training step over a jax.sharding.Mesh.

New capability relative to the single-GPU reference (SURVEY.md §2.3): a batch of B
cameras is sharded over the mesh's `data` axis; every device runs the full fused
render + loss + backward for its cameras; gradients are mean-reduced across the batch
(XLA lowers the reduction to psum over ICI under pjit) and one Adam step is applied to
the replicated parameters. Gaussian pool rows and their Adam moments are sharded over
the `gauss` axis for HBM scaling; when gauss > 1 the render runs through the
tile-ownership all-to-all exchange (parallel.gauss_shard.rasterize_gauss_sharded) in
BOTH forward and backward — the pool is never all-gathered.

Note on semantics: the reference applies one Adam step per image. B-way DP applies one
step per B images with averaged gradients — the standard large-batch trade; the
densification statistics accumulate across the whole batch, matching B sequential
reference steps.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models import gaussians as G
from ..models.nets import MLPNet
from ..ops.rasterize import RasterizerConfig, CameraMatrices
from ..train_step import TrainState, StepAux, forward_loss, make_lr_tree, make_optimizer


class CameraBatch(NamedTuple):
    """Stacked per-camera arrays, leading dim = batch (sharded over `data`)."""
    viewmat: jnp.ndarray          # [B, 4, 4]
    projmat: jnp.ndarray          # [B, 4, 4]
    campos: jnp.ndarray           # [B, 3]
    tan_fovx: jnp.ndarray         # [B]
    tan_fovy: jnp.ndarray         # [B]
    gt_image: jnp.ndarray         # [B, H, W, 3]
    sky_mask: jnp.ndarray         # [B, H, W]
    occluders_mask: jnp.ndarray   # [B, H, W]
    uid: jnp.ndarray              # [B]


def batch_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def gauss_sharding(mesh: Mesh, capacity: int):
    """Pool rows (dim0 == capacity) sharded over `gauss`; everything else
    replicated."""
    def spec(a):
        if getattr(a, "ndim", 0) >= 1 and a.shape[0] == capacity:
            return NamedSharding(mesh, P("gauss"))
        return NamedSharding(mesh, P())
    return spec


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the pool (params + Adam moments + masks) over `gauss`, replicate the
    nets/embeddings."""
    capacity = state.gauss_state.alive.shape[0]
    gspec = gauss_sharding(mesh, capacity)
    rep = NamedSharding(mesh, P())

    def place_gauss(tree):
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, gspec(a)), tree)

    def place_rep(tree):
        return jax.tree_util.tree_map(lambda a: jax.device_put(a, rep), tree)

    params = dict(
        gaussians=place_gauss(state.params["gaussians"]),
        mlp=place_rep(state.params["mlp"]),
        embeddings=place_rep(state.params["embeddings"]),
    )
    opt = state.opt_state._replace(
        mu=dict(state.opt_state.mu, gaussians=place_gauss(state.opt_state.mu["gaussians"]),
                mlp=place_rep(state.opt_state.mu["mlp"]),
                embeddings=place_rep(state.opt_state.mu["embeddings"])),
        nu=dict(state.opt_state.nu, gaussians=place_gauss(state.opt_state.nu["gaussians"]),
                mlp=place_rep(state.opt_state.nu["mlp"]),
                embeddings=place_rep(state.opt_state.nu["embeddings"])),
    )
    gstate = place_gauss(state.gauss_state)
    return TrainState(params, gstate, opt, jax.device_put(state.step, rep))


def make_dp_train_step(mlp: MLPNet, cfg: Config, rcfg: RasterizerConfig, mesh: Mesh):
    """Build the jitted data-parallel step: (TrainState, CameraBatch, keys, bg) ->
    (TrainState, metrics). With a gauss axis > 1 the rasterization inside every
    per-camera loss runs gauss-sharded (tile-ownership all-to-all, no pool
    all-gather in forward or backward)."""
    gauss_sharded = "gauss" in mesh.shape and mesh.shape["gauss"] > 1
    if gauss_sharded:
        from .gauss_shard import rasterize_gauss_sharded

        def raster_fn(xyz, scales, quats, opacity, colors, bg, cam, rc,
                      mean2d_probe=None, active=None):
            return rasterize_gauss_sharded(
                xyz, scales, quats, opacity, colors, bg, cam, rc, mesh,
                mean2d_probe=mean2d_probe, active=active)
    else:
        raster_fn = None

    def per_camera_loss(params, gauss_state, probe, batch: CameraBatch, i, key, step, bg):
        cam = CameraMatrices(
            viewmat=batch.viewmat[i], projmat=batch.projmat[i], campos=batch.campos[i],
            tan_fovx=batch.tan_fovx[i], tan_fovy=batch.tan_fovy[i],
        )
        return forward_loss(
            params, gauss_state, probe, mlp, cam, batch.gt_image[i],
            batch.sky_mask[i], batch.occluders_mask[i], batch.uid[i], key, step,
            cfg, rcfg, bg, raster_fn=raster_fn,
        )

    def per_image_grads(params, gauss_state, probe, batch, keys, step, bg):
        """Per-image (NOT mean) loss gradients, stacked on a leading batch dim.

        vmap over cameras when purely data-parallel (XLA splits the batch over
        `data`); with a gauss axis the shard_map inside raster_fn composes with
        lax.scan but not vmap, so cameras run sequentially and the gauss axis
        parallelizes WITHIN each camera (the reference's own semantics is one
        image at a time, train.py:55-163)."""
        B = batch.uid.shape[0]

        def one(i, k):
            return jax.value_and_grad(
                lambda p, pr: per_camera_loss(p, gauss_state, pr, batch, i, k,
                                              step, bg),
                argnums=(0, 1), has_aux=True)(params, probe)

        if gauss_sharded:
            def body(_, ik):
                i, k = ik
                (loss, aux), grads = one(i, k)
                return 0, (loss, aux, grads)
            _, (losses, auxs, grads) = jax.lax.scan(
                body, 0, (jnp.arange(B), keys))
        else:
            (losses, auxs), grads = jax.vmap(one)(jnp.arange(B), keys)
        return losses, auxs, grads

    def step_fn(state: TrainState, batch: CameraBatch, keys, bg):
        n = state.gauss_state.alive.shape[0]
        probe = jnp.zeros((n, 2))
        B = batch.uid.shape[0]
        losses, auxs, (param_grads_b, probe_grad_b) = per_image_grads(
            state.params, state.gauss_state, probe, batch, keys, state.step, bg)

        # SEQUENTIAL Adam microsteps from the B parallel gradients: gradient i is
        # computed at the pre-batch params (parallel), but the Adam moments and
        # parameters update once PER IMAGE in order — matching the reference's
        # one-step-per-image dynamics (train.py:55-163: B lr-sized moves and B
        # moment updates per B images) up to gradient staleness within the batch.
        # A single mean-gradient step (the r2 semantics) moves the params only
        # ~1/B as far per image under Adam's normalization and was measured
        # 3.5 dB behind per-image training (DP_AB_r02.json, VERDICT r2 item 3).
        adam = make_optimizer()

        # Binning overflow poisons that image's gradients: reject its microstep
        # in-graph (same contract as the single-device _apply_update,
        # train_step.py) — params/moments keep their values, the step counter
        # still advances for the lr schedule.
        ok_b = auxs["overflow"] == 0

        def micro(carry, i):
            params, opt_state, step = carry
            g = jax.tree_util.tree_map(lambda a: a[i], param_grads_b)
            updates, new_opt_state = adam.update(g, opt_state, params)
            lrs = make_lr_tree(params, step, cfg.optimizer)
            updates = jax.tree_util.tree_map(lambda u, lr: -lr * u, updates, lrs)
            new_params = optax.apply_updates(params, updates)
            sel = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok_b[i], a, b), new, old)
            return (sel(new_params, params), sel(new_opt_state, opt_state),
                    step + 1), 0

        (new_params, new_opt_state, new_step), _ = jax.lax.scan(
            micro, (state.params, state.opt_state, state.step), jnp.arange(B))

        # Densification stats: per-image probe grads summed over the batch — the
        # same accumulation B sequential reference steps perform
        # (gaussian_model.py:627-629). Overflowed images contribute nothing.
        ndc_grad = jnp.sum(
            probe_grad_b * ok_b[:, None, None], axis=0) * jnp.asarray(
            [0.5 * rcfg.width, 0.5 * rcfg.height])
        visible_any = jnp.any(auxs["visibility"] & ok_b[:, None], axis=0)
        max_radii = jnp.max(auxs["radii"] * ok_b[:, None], axis=0)
        new_gstate = G.add_densification_stats(state.gauss_state, ndc_grad,
                                               visible_any, max_radii)

        # The step counter advances by B: schedules (lr decay, densify gates) are
        # defined on the reference's image-count axis.
        new_state = TrainState(new_params, new_gstate, new_opt_state, new_step)
        metrics = dict(
            loss=jnp.mean(losses),
            l1=jnp.mean(auxs["l1"]),
            psnr=jnp.mean(auxs["psnr"]),
            overflow=jnp.max(auxs["overflow"]),
            num_alive=G.num_alive(new_gstate),
        )
        return new_state, metrics

    rep = NamedSharding(mesh, P())
    bspec = NamedSharding(mesh, P("data"))
    batch_shardings = CameraBatch(*([bspec] * len(CameraBatch._fields)))
    return jax.jit(
        step_fn,
        in_shardings=(None, batch_shardings, bspec, rep),
        donate_argnums=(0,),
    )
