"""Camera-batched data-parallel training step over a jax.sharding.Mesh.

New capability relative to the single-GPU reference (SURVEY.md §2.3): a batch of B
cameras is sharded over the mesh's `data` axis; every device runs the full fused
render + loss + backward for its cameras; gradients are mean-reduced across the batch
(XLA lowers the reduction to psum over ICI under pjit) and one Adam step is applied to
the replicated parameters. Gaussian pool rows and their Adam moments are sharded over
the `gauss` axis for HBM scaling; XLA inserts the gather for the binning stage.

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
    (TrainState, metrics)."""

    def per_camera_loss(params, gauss_state, probe, batch: CameraBatch, i, key, step, bg):
        cam = CameraMatrices(
            viewmat=batch.viewmat[i], projmat=batch.projmat[i], campos=batch.campos[i],
            tan_fovx=batch.tan_fovx[i], tan_fovy=batch.tan_fovy[i],
        )
        return forward_loss(
            params, gauss_state, probe, mlp, cam, batch.gt_image[i],
            batch.sky_mask[i], batch.occluders_mask[i], batch.uid[i], key, step,
            cfg, rcfg, bg,
        )

    def batched_loss(params, gauss_state, probe, batch, keys, step, bg):
        B = batch.uid.shape[0]
        losses, auxs = jax.vmap(
            lambda i, k: per_camera_loss(params, gauss_state, probe, batch, i, k, step, bg)
        )(jnp.arange(B), keys)
        # Mean loss over the batch -> psum over `data` when lowered.
        return jnp.mean(losses), auxs

    def step_fn(state: TrainState, batch: CameraBatch, keys, bg):
        n = state.gauss_state.alive.shape[0]
        probe = jnp.zeros((n, 2))
        (loss, auxs), grads = jax.value_and_grad(batched_loss, argnums=(0, 2), has_aux=True)(
            state.params, state.gauss_state, probe, batch, keys, state.step, bg
        )
        param_grads, probe_grad = grads

        adam = make_optimizer()
        updates, new_opt_state = adam.update(param_grads, state.opt_state, state.params)
        lrs = make_lr_tree(state.params, state.step, cfg.optimizer)
        updates = jax.tree_util.tree_map(lambda u, lr: -lr * u, updates, lrs)
        new_params = optax.apply_updates(state.params, updates)

        # Densification stats: probe grads already sum contributions over the batch
        # (mean loss => /B; undo to match B sequential reference steps).
        B = batch.uid.shape[0]
        ndc_grad = probe_grad * B * jnp.asarray([0.5 * rcfg.width, 0.5 * rcfg.height])
        visible_any = jnp.any(auxs["visibility"], axis=0)
        max_radii = jnp.max(auxs["radii"], axis=0)
        new_gstate = G.add_densification_stats(state.gauss_state, ndc_grad,
                                               visible_any, max_radii)

        new_state = TrainState(new_params, new_gstate, new_opt_state, state.step + 1)
        metrics = dict(
            loss=loss,
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
