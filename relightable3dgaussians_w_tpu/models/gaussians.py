"""Gaussian parameter pool with sky parameterization and adaptive density control.

TPU-native re-design of the reference's `GaussianModel` (scene/gaussian_model.py:27-648).
The reference grows/shrinks torch tensors and performs optimizer-state surgery on every
densify/prune (cat/prune/replace of Adam moments, gaussian_model.py:420-511) — shapes
change constantly, which is incompatible with XLA. Here the pool has a FIXED capacity
with an `alive` mask (SURVEY.md §7): clone/split write into free slots, prune clears
the mask, and the matching rows of the Adam moments are zeroed in-place — all pure
array ops inside jit. Capacity overflow is reported via counters and handled by a
host-side `grow()` + re-jit.

Foreground and sky Gaussians share pool rows: `is_sky` selects between the `xyz`
parameter and the sphere parameterization (theta, phi, radius, center) of
`get_sky_xyz` (gaussian_model.py:95-103,159-169). Activations (exp / sigmoid /
normalize) match gaussian_model.py:62-70.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.general import (
    inverse_sigmoid,
    get_minimum_axis,
    flip_align_view,
    cartesian_to_polar,
    polar_to_cartesian,
)
from ..utils.graphics import quat_to_rotmat

DEFAULT_ALBEDO = 1.0      # gaussian_model.py:55-57 (pre-sigmoid logits)
DEFAULT_ROUGHNESS = 1.0
DEFAULT_METALNESS = 0.1


class GaussianParams(NamedTuple):
    """Optimizable leaves, all [cap, ...]. Rows beyond `alive` are inert."""
    xyz: jnp.ndarray        # [cap, 3] world position (foreground rows)
    albedo: jnp.ndarray     # [cap, 3] pre-sigmoid
    opacity: jnp.ndarray    # [cap, 1] pre-sigmoid
    scaling: jnp.ndarray    # [cap, 3] log-scale
    rotation: jnp.ndarray   # [cap, 4] unnormalized quaternion (w, x, y, z)
    roughness: jnp.ndarray  # [cap, 1] pre-sigmoid
    metalness: jnp.ndarray  # [cap, 1] pre-sigmoid
    sky_angles: jnp.ndarray # [cap, 2] (theta, phi) (sky rows)
    sky_radius: jnp.ndarray # [] scalar


class GaussianState(NamedTuple):
    """Non-optimized pool state."""
    alive: jnp.ndarray           # [cap] bool
    is_sky: jnp.ndarray          # [cap] bool
    sky_center: jnp.ndarray      # [3]
    max_radii2d: jnp.ndarray     # [cap] float
    xyz_grad_accum: jnp.ndarray  # [cap] float — accumulated ||dL/dmean2d_ndc||
    denom: jnp.ndarray           # [cap] float


# --------------------------------------------------------------------- activations


def get_scaling(p: GaussianParams) -> jnp.ndarray:
    return jnp.exp(p.scaling)


def get_rotation(p: GaussianParams) -> jnp.ndarray:
    from ..utils.graphics import safe_normalize

    return safe_normalize(p.rotation)


def get_opacity(p: GaussianParams, s: GaussianState) -> jnp.ndarray:
    # Dead rows get exactly 0 opacity -> alpha < 1/255 skip culls them everywhere.
    return jax.nn.sigmoid(p.opacity) * s.alive[:, None]


def get_albedo(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.albedo)


def get_roughness(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.roughness)


def get_metalness(p: GaussianParams) -> jnp.ndarray:
    return jax.nn.sigmoid(p.metalness)


def get_sky_angles(p: GaussianParams) -> jnp.ndarray:
    """Clamp theta to [0, pi/2], phi to [-pi/2, pi/2] (gaussian_model.py:159-169)."""
    theta = jnp.clip(p.sky_angles[:, 0], 0.0, jnp.pi / 2)
    phi = jnp.clip(p.sky_angles[:, 1], -jnp.pi / 2, jnp.pi / 2)
    return jnp.stack([theta, phi], axis=-1)


def get_xyz(p: GaussianParams, s: GaussianState) -> jnp.ndarray:
    """Scatter-merge of fg xyz and sphere-parameterized sky xyz
    (gaussian_model.py:84-103)."""
    sky_xyz = polar_to_cartesian(get_sky_angles(p), s.sky_center, p.sky_radius)
    return jnp.where(s.is_sky[:, None], sky_xyz, p.xyz)


def get_normal(p: GaussianParams, dir_pp_normalized: jnp.ndarray | None = None) -> jnp.ndarray:
    """Shortest-covariance-axis normal, flipped toward the viewer
    (gaussian_model.py:115-122)."""
    R = quat_to_rotmat(get_rotation(p))
    n = get_minimum_axis(get_scaling(p), R)
    if dir_pp_normalized is not None:
        n, _ = flip_align_view(n, dir_pp_normalized)
    return n


# ------------------------------------------------------------------- construction


def init_from_points(points: np.ndarray, knn_dist2: np.ndarray, capacity: int) -> tuple[GaussianParams, GaussianState]:
    """Initialize the pool from a point cloud (create_from_pcd,
    gaussian_model.py:182-207): isotropic log-scales from mean 3-NN squared distance,
    identity rotations, opacity 0.1.

    Args:
        points: [N, 3].
        knn_dist2: [N] mean squared distance to the 3 nearest neighbors.
        capacity: static pool size (>= N).
    """
    n = points.shape[0]
    assert capacity >= n, (capacity, n)

    def full(val, shape):
        a = np.zeros((capacity,) + shape, dtype=np.float32)
        if np.ndim(val) == 0:
            a[:n] = val
        else:
            a[:n] = val
        return jnp.asarray(a)

    scales = np.log(np.sqrt(np.maximum(knn_dist2, 1e-7)))[:, None].repeat(3, axis=1)
    rot = np.zeros((n, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    params = GaussianParams(
        xyz=full(points.astype(np.float32), (3,)),
        albedo=full(DEFAULT_ALBEDO, (3,)),
        opacity=full(float(inverse_sigmoid(0.1)), (1,)),
        scaling=full(scales.astype(np.float32), (3,)),
        rotation=full(rot, (4,)),
        roughness=full(DEFAULT_ROUGHNESS, (1,)),
        metalness=full(DEFAULT_METALNESS, (1,)),
        sky_angles=jnp.zeros((capacity, 2), jnp.float32),
        sky_radius=jnp.asarray(1.0, jnp.float32),
    )
    alive = np.zeros(capacity, dtype=bool)
    alive[:n] = True
    state = GaussianState(
        alive=jnp.asarray(alive),
        is_sky=jnp.zeros(capacity, dtype=bool),
        sky_center=jnp.zeros(3, jnp.float32),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, state


def augment_with_sky(params: GaussianParams, state: GaussianState,
                     sky_points: np.ndarray, sky_knn_dist2: np.ndarray,
                     sky_radius: float, sky_center: np.ndarray) -> tuple[GaussianParams, GaussianState]:
    """Append sky Gaussians on the hemisphere shell (augment_with_sky_gaussians,
    gaussian_model.py:233-256). Host-side (called once at setup)."""
    cap = state.alive.shape[0]
    n0 = int(np.asarray(state.alive).sum())
    m = sky_points.shape[0]
    assert n0 + m <= cap, (n0, m, cap)
    sl = slice(n0, n0 + m)

    angles = np.asarray(
        cartesian_to_polar(jnp.asarray(sky_points, jnp.float32), jnp.asarray(sky_center, jnp.float32), sky_radius)
    )
    scales = np.log(np.sqrt(np.maximum(sky_knn_dist2, 1e-7)))[:, None].repeat(3, axis=1)

    def upd(arr, val):
        return arr.at[sl].set(jnp.asarray(val, jnp.float32))

    rot = np.zeros((m, 4), dtype=np.float32)
    rot[:, 0] = 1.0
    params = params._replace(
        opacity=upd(params.opacity, np.full((m, 1), float(inverse_sigmoid(0.1)))),
        scaling=upd(params.scaling, scales),
        rotation=upd(params.rotation, rot),
        sky_angles=upd(params.sky_angles, angles),
        sky_radius=jnp.asarray(sky_radius, jnp.float32),
    )
    alive = state.alive.at[sl].set(True)
    is_sky = state.is_sky.at[sl].set(True)
    state = state._replace(alive=alive, is_sky=is_sky, sky_center=jnp.asarray(sky_center, jnp.float32))
    return params, state


def grow(params: GaussianParams, state: GaussianState, new_capacity: int):
    """Host-side capacity growth (re-jit afterwards)."""
    cap = state.alive.shape[0]
    assert new_capacity >= cap
    pad = new_capacity - cap

    def padp(a):
        if a.ndim == 0:
            return a
        return jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    return (
        GaussianParams(*[padp(a) for a in params]),
        GaussianState(
            alive=padp(state.alive),
            is_sky=padp(state.is_sky),
            sky_center=state.sky_center,
            max_radii2d=padp(state.max_radii2d),
            xyz_grad_accum=padp(state.xyz_grad_accum),
            denom=padp(state.denom),
        ),
    )


# -------------------------------------------------------------- density control


class DensifyReport(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    overflow: jnp.ndarray  # selected-but-not-allocated due to capacity


def _allocate_slots(free: jnp.ndarray, want: jnp.ndarray):
    """Assign ranks of `want` rows to indices of `free` rows.

    Returns (src_idx [cap], dst_idx [cap], count) where the first `count` pairs are
    valid copies; the rest point at row `cap` (dropped by scatter mode='drop')."""
    cap = free.shape[0]
    count = jnp.minimum(jnp.sum(free), jnp.sum(want))
    src_idx = jnp.nonzero(want, size=cap, fill_value=cap)[0]
    dst_idx = jnp.nonzero(free, size=cap, fill_value=cap)[0]
    return src_idx, dst_idx, count


def _copy_rows(tree, src_idx, dst_idx, count, transform=None):
    """tree[dst_idx[i]] = transform(tree)[src_idx[i]] for i < count, functional."""
    cap = src_idx.shape[0]
    keep = jnp.arange(cap) < count
    dst = jnp.where(keep, dst_idx, cap)

    def copy_leaf(a, ta):
        if a.ndim == 0:
            return a
        rows = ta[jnp.clip(src_idx, 0, cap - 1)]
        return a.at[dst].set(rows, mode="drop")

    ta_tree = tree if transform is None else transform
    return jax.tree_util.tree_map(copy_leaf, tree, ta_tree)


def add_densification_stats(state: GaussianState, mean2d_grad_ndc: jnp.ndarray,
                            visible: jnp.ndarray, radii: jnp.ndarray) -> GaussianState:
    """Accumulate ||dL/dmean2D|| (NDC-unit contract, backward.cu:460-461) over visible
    Gaussians and track max screen radius (train.py:130, gaussian_model.py:627-629)."""
    norm = jnp.linalg.norm(mean2d_grad_ndc[:, :2], axis=-1)
    upd = visible & state.alive
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(upd, norm, 0.0),
        denom=state.denom + upd.astype(state.denom.dtype),
        max_radii2d=jnp.where(upd, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)), state.max_radii2d),
    )


def densify_and_prune(key, params: GaussianParams, state: GaussianState, opt_moments,
                      grad_threshold, min_opacity: float, extent,
                      max_screen_size, percent_dense: float = 0.01, n_split: int = 2):
    """Clone small / split large high-gradient Gaussians, then prune — the functional
    equivalent of densify_and_prune (gaussian_model.py:545-624) over the fixed pool.

    Args:
        opt_moments: pytree(s) shaped like GaussianParams whose rows must be zeroed
            for newly allocated slots (e.g. (mu, nu) of Adam). Pass a tuple.
    Returns:
        (params, state, opt_moments, DensifyReport)
    """
    cap = state.alive.shape[0]
    grads = jnp.where(state.denom > 0, state.xyz_grad_accum / jnp.maximum(state.denom, 1), 0.0)
    scaling = get_scaling(params)
    max_scale = jnp.max(scaling, axis=-1)
    xyz_all = get_xyz(params, state)

    # ---- clone (small Gaussians): copy row verbatim (gaussian_model.py:584-607)
    clone_sel = (grads >= grad_threshold) & (max_scale <= percent_dense * extent) & state.alive
    src_c, dst_c, cnt_c = _allocate_slots(~state.alive, clone_sel)
    params = _copy_rows(params, src_c, dst_c, cnt_c)
    state_alive = state.alive.at[jnp.where(jnp.arange(cap) < cnt_c, dst_c, cap)].set(True, mode="drop")
    is_sky_new = state.is_sky.at[jnp.where(jnp.arange(cap) < cnt_c, dst_c, cap)].set(
        state.is_sky[jnp.clip(src_c, 0, cap - 1)], mode="drop")
    state = state._replace(alive=state_alive, is_sky=is_sky_new)
    opt_moments = tuple(_zero_rows(m, dst_c, cnt_c) for m in opt_moments)

    # ---- split (large Gaussians): N samples from the Gaussian, scale /(0.8*N)
    # (gaussian_model.py:545-581). The pool version allocates N-1 new rows and
    # converts the source row into the N-th sample in place.
    split_sel = (grads >= grad_threshold) & (max_scale > percent_dense * extent) & state.alive
    R = quat_to_rotmat(get_rotation(params))
    noise = jax.random.normal(key, (n_split, cap, 3)) * scaling[None]
    samples = jnp.einsum("nij,snj->sni", R, noise) + xyz_all[None]        # [S, cap, 3]
    # Sky samples reproject onto the sphere (gaussian_model.py:570-573). NOTE: the
    # reference converts the projected points back to angles with the DEFAULT radius
    # 1.0 (gaussian_model.py:573 omits the radius arg of cartesian_to_polar_coord),
    # which distorts theta for scenes with sky_radius != 1; we use the true radius.
    rel = samples - state.sky_center[None, None, :]
    rel_n = rel * jax.lax.rsqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1, keepdims=True), 1e-20))
    sky_proj = state.sky_center[None, None, :] + params.sky_radius * rel_n
    sky_samples = cartesian_to_polar(sky_proj, state.sky_center, params.sky_radius)  # [S, cap, 2]
    new_scaling = jnp.log(scaling / (0.8 * n_split))

    n_split_sel = jnp.sum(split_sel)
    n_split_alloc = jnp.int32(0)
    # Allocate (n_split - 1) slots per selected row, slot-major so ordering is stable.
    free_after_clone = ~state.alive
    for s in range(n_split - 1):
        split_params = params._replace(
            xyz=samples[s], sky_angles=jnp.where(state.is_sky[:, None], sky_samples[s], params.sky_angles),
            scaling=new_scaling,
        )
        src_s, dst_s, cnt_s = _allocate_slots(free_after_clone, split_sel)
        params = _copy_rows(params, src_s, dst_s, cnt_s, transform=split_params)
        dmask = jnp.where(jnp.arange(cap) < cnt_s, dst_s, cap)
        state = state._replace(
            alive=state.alive.at[dmask].set(True, mode="drop"),
            is_sky=state.is_sky.at[dmask].set(state.is_sky[jnp.clip(src_s, 0, cap - 1)], mode="drop"),
        )
        opt_moments = tuple(_zero_rows(m, dst_s, cnt_s) for m in opt_moments)
        free_after_clone = free_after_clone.at[dmask].set(False, mode="drop")
        n_split_alloc = n_split_alloc + cnt_s
    # Convert source rows in place to the last sample.
    last = n_split - 1
    params = params._replace(
        xyz=jnp.where(split_sel[:, None], samples[last], params.xyz),
        sky_angles=jnp.where((split_sel & state.is_sky)[:, None], sky_samples[last], params.sky_angles),
        scaling=jnp.where(split_sel[:, None], new_scaling, params.scaling),
    )
    opt_moments = tuple(_zero_selected(m, split_sel) for m in opt_moments)

    # Reset stats BEFORE pruning: the reference's densification_postfix zeroes
    # max_radii2D (gaussian_model.py:540-542), so the subsequent screen-size prune
    # criterion (gaussian_model.py:618-619) compares against zeros and never fires —
    # a long-standing 3DGS quirk we replicate for parity.
    state = state._replace(
        xyz_grad_accum=jnp.zeros_like(state.xyz_grad_accum),
        denom=jnp.zeros_like(state.denom),
        max_radii2d=jnp.zeros_like(state.max_radii2d),
    )

    # ---- prune (gaussian_model.py:610-622)
    opa = get_opacity(params, state)[:, 0]
    prune = (opa < min_opacity) & state.alive
    if max_screen_size is not None:
        prune = prune | (state.max_radii2d > max_screen_size) | (jnp.max(get_scaling(params), axis=-1) > 0.1 * extent)
        prune = prune & state.alive
    state = state._replace(alive=state.alive & ~prune)

    overflow = (jnp.sum(clone_sel) - cnt_c) + ((n_split - 1) * n_split_sel - n_split_alloc)
    report = DensifyReport(
        n_cloned=cnt_c, n_split=n_split_sel, n_pruned=jnp.sum(prune), overflow=overflow
    )
    return params, state, opt_moments, report


def _zero_rows(tree, dst_idx, count):
    cap = dst_idx.shape[0]
    dst = jnp.where(jnp.arange(cap) < count, dst_idx, cap)

    def z(a):
        if a.ndim == 0:
            return a
        return a.at[dst].set(jnp.zeros((cap,) + a.shape[1:], a.dtype), mode="drop")

    return jax.tree_util.tree_map(z, tree)


def _zero_selected(tree, sel):
    def z(a):
        if a.ndim == 0:
            return a
        return jnp.where(sel.reshape((-1,) + (1,) * (a.ndim - 1)), 0.0, a)

    return jax.tree_util.tree_map(z, tree)


def reset_opacity(params: GaussianParams, opt_moments):
    """Clamp opacity to <= 0.01 and zero its Adam moments (reset_opacity,
    gaussian_model.py:359-362 + replace_tensor_to_optimizer)."""
    new_op = inverse_sigmoid(jnp.minimum(jax.nn.sigmoid(params.opacity), 0.01))
    params = params._replace(opacity=new_op)
    opt_moments = tuple(
        m._replace(opacity=jnp.zeros_like(m.opacity)) if isinstance(m, GaussianParams)
        else jax.tree_util.tree_map(lambda a: a, m)
        for m in opt_moments
    )
    return params, opt_moments


def num_alive(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.alive)
