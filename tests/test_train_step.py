"""End-to-end training-step smoke tests on a synthetic scene: loss decreases, all
state updates are finite, densify/prune and opacity reset run under jit."""

import numpy as np
import jax
import jax.numpy as jnp

from relightable3dgaussians_w_tpu.config import Config
from relightable3dgaussians_w_tpu.models import gaussians as G
from relightable3dgaussians_w_tpu.models.nets import MLPNet, init_mlp, init_embeddings
from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig, CameraMatrices
from relightable3dgaussians_w_tpu.train_step import TrainState, make_train_fns, make_optimizer
from relightable3dgaussians_w_tpu.utils.graphics import projection_matrix


def build_setup(n=120, n_sky=30, cap=512, W=64, H=64):
    rng = np.random.RandomState(0)
    pts = np.zeros((n, 3), np.float32)
    pts[:, 0] = rng.uniform(-1, 1, n)
    pts[:, 1] = rng.uniform(-1, 1, n)
    pts[:, 2] = rng.uniform(2, 5, n)
    d2 = np.full(n, 0.01, np.float32)
    params, state = G.init_from_points(pts, d2, cap)

    theta = rng.uniform(0.2, 1.2, n_sky)
    phi = rng.uniform(-1.2, 1.2, n_sky)
    sky_pts = np.stack(
        [8 * np.sin(theta) * np.sin(phi), -8 * np.cos(theta), 8 * np.sin(theta) * np.cos(phi)],
        axis=-1,
    ).astype(np.float32)
    params, state = G.augment_with_sky(params, state, sky_pts, np.full(n_sky, 0.05),
                                       8.0, np.zeros(3, np.float32))

    cfg = Config()
    cfg.optimizer.reg_normal_from_iter = 0
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    kp = jax.random.PRNGKey(0)
    mlp_params = init_mlp(kp, mlp)
    emb = init_embeddings(jax.random.fold_in(kp, 1), 3)
    pd = {"gaussians": params, "mlp": mlp_params, "embeddings": emb}
    opt_state = make_optimizer().init(pd)
    tstate = TrainState(pd, state, opt_state, jnp.asarray(0))

    fov = np.deg2rad(60)
    view = np.eye(4, dtype=np.float32)
    proj = projection_matrix(0.01, 100, fov, fov)
    cam = CameraMatrices(
        viewmat=jnp.asarray(view), projmat=jnp.asarray(proj @ view),
        campos=jnp.zeros(3), tan_fovx=jnp.float32(np.tan(fov / 2)),
        tan_fovy=jnp.float32(np.tan(fov / 2)),
    )
    rcfg = RasterizerConfig(width=W, height=H, max_dup=1 << 14, max_tiles_per_gauss=32,
                            lmax_per_tile=256, tile_chunk=4)
    fns = make_train_fns(mlp, cfg, rcfg)
    gt = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
    sky_mask = jnp.ones((H, W))
    occ = jnp.ones((H, W))
    return tstate, fns, cam, gt, sky_mask, occ, cfg


def test_train_steps_reduce_loss():
    tstate, fns, cam, gt, sky, occ, cfg = build_setup()
    key = jax.random.PRNGKey(42)
    losses = []
    bg = jnp.zeros(3)
    for i in range(12):
        key, k = jax.random.split(key)
        tstate, aux = fns.train_step(tstate, cam, gt, sky, occ, jnp.asarray(0), k, bg)
        losses.append(float(aux.loss))
        assert np.isfinite(losses[-1]), f"non-finite loss at step {i}"
        assert int(aux.overflow) == 0
    # Optimization must make progress on a fixed target.
    assert losses[-1] < losses[0], losses
    # All params stayed finite.
    for leaf in jax.tree_util.tree_leaves(tstate.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_train_improves_psnr_image_dominant():
    """With the regularizers off, a few Adam steps must IMPROVE the rendered-image
    PSNR against a fixed target — 'loss decreases' alone can be satisfied by
    regularizer descent while the image degrades (the planar prior dominates early
    training when splats start large; see scripts/selfcheck_train.py)."""
    tstate, _, cam, gt, sky, occ, cfg = build_setup()
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.models.nets import MLPNet

    o = cfg.optimizer
    o.lambda_dssim = 0.0
    o.lambda_sky_brdf = 0.0
    o.lambda_normal = 0.0
    o.lambda_envlight = 0.0
    o.lambda_scale = 0.0
    o.lambda_sky_gauss = 0.0
    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    rcfg = RasterizerConfig(width=64, height=64, max_dup=1 << 14,
                            max_tiles_per_gauss=32, lmax_per_tile=256, tile_chunk=4)
    fns = make_train_fns(mlp, cfg, rcfg)

    key = jax.random.PRNGKey(3)
    bg = jnp.zeros(3)
    first = None
    last = None
    for i in range(25):
        key, k = jax.random.split(key)
        tstate, aux = fns.train_step(tstate, cam, gt, sky, occ, jnp.asarray(0), k, bg)
        if first is None:
            first = float(aux.psnr)
        last = float(aux.psnr)
    assert last > first + 0.3, (first, last)


def test_split_dispatch_matches_fused():
    """The 3-dispatch step (train_step.py make_train_fns split_dispatch=True) must
    produce the SAME updated parameters and aux as the fused single-program step —
    the input stage is recomputed in the VJP dispatch with the same key."""
    tstate, fns, cam, gt, sky, occ, cfg = build_setup()
    from relightable3dgaussians_w_tpu.ops.rasterize import RasterizerConfig
    from relightable3dgaussians_w_tpu.models.nets import MLPNet

    mlp = MLPNet(sh_degree_envl=cfg.model.envlight_sh_degree,
                 sh_degree_sky=cfg.model.sky_sh_degree)
    rcfg = RasterizerConfig(width=64, height=64, max_dup=1 << 14,
                            max_tiles_per_gauss=32, lmax_per_tile=256, tile_chunk=4)
    key = jax.random.PRNGKey(7)
    bg = jnp.zeros(3)
    s_f, aux_f = fns.train_step(tstate, cam, gt, sky, occ, jnp.asarray(0), key, bg)

    # Both split variants (3-dispatch A/B/C and 5-dispatch with the preprocess
    # outputs staged inside B) must match the fused step.
    for sub in (False, True):
        fns_split = make_train_fns(mlp, cfg, rcfg, split_dispatch=True,
                                   sub_split_b=sub)
        s_s, aux_s = fns_split.train_step(tstate, cam, gt, sky, occ,
                                          jnp.asarray(0), key, bg)
        np.testing.assert_allclose(float(aux_f.loss), float(aux_s.loss), rtol=1e-6)
        for lf, ls in zip(jax.tree_util.tree_leaves(s_f.params),
                          jax.tree_util.tree_leaves(s_s.params)):
            np.testing.assert_allclose(np.asarray(lf), np.asarray(ls),
                                       rtol=2e-4, atol=2e-6,
                                       err_msg=f"sub_split_b={sub}")
        np.testing.assert_allclose(np.asarray(s_f.gauss_state.xyz_grad_accum),
                                   np.asarray(s_s.gauss_state.xyz_grad_accum),
                                   rtol=2e-4, atol=1e-7)


def test_densify_and_reset_opacity():
    tstate, fns, cam, gt, sky, occ, cfg = build_setup()
    key = jax.random.PRNGKey(0)
    bg = jnp.zeros(3)
    for _ in range(3):
        key, k = jax.random.split(key)
        tstate, aux = fns.train_step(tstate, cam, gt, sky, occ, jnp.asarray(0), k, bg)
    alive_before = int(G.num_alive(tstate.gauss_state))

    tstate2, report = fns.densify_step(tstate, key, jnp.asarray(1e-9), jnp.asarray(3.0))
    alive_after = int(G.num_alive(tstate2.gauss_state))
    assert int(report.n_cloned) + int(report.n_split) > 0
    assert alive_after >= alive_before
    for leaf in jax.tree_util.tree_leaves(tstate2.params):
        assert np.isfinite(np.asarray(leaf)).all()
    # Stats must be reset after densification.
    assert float(jnp.sum(tstate2.gauss_state.denom)) == 0.0

    tstate3 = fns.reset_opacity_step(tstate2)
    op = np.asarray(G.get_opacity(tstate3.params["gaussians"], tstate3.gauss_state))
    assert op[np.asarray(tstate3.gauss_state.alive)].max() <= 0.0101
    # Opacity Adam moments zeroed.
    assert float(jnp.abs(tstate3.opt_state.mu["gaussians"].opacity).max()) == 0.0


def test_split_conserves_sky_membership():
    tstate, fns, cam, gt, sky, occ, cfg = build_setup()
    key = jax.random.PRNGKey(1)
    bg = jnp.zeros(3)
    tstate, _ = fns.train_step(tstate, cam, gt, sky, occ, jnp.asarray(0), key, bg)
    s0 = tstate.gauss_state
    n_sky_before = int(jnp.sum(s0.is_sky & s0.alive))
    tstate2, rep = fns.densify_step(tstate, key, jnp.asarray(1e-9), jnp.asarray(0.001))
    s1 = tstate2.gauss_state
    # splits happened (extent tiny -> everything counts as "large")
    assert int(rep.n_split) > 0
    n_sky_after = int(jnp.sum(s1.is_sky & s1.alive))
    assert n_sky_after >= n_sky_before
    # sky rows remain on the sphere: radius of their xyz
    p2 = tstate2.params["gaussians"]
    xyz = np.asarray(G.get_xyz(p2, s1))
    m = np.asarray(s1.is_sky & s1.alive)
    r = np.linalg.norm(xyz[m] - np.asarray(s1.sky_center), axis=-1)
    np.testing.assert_allclose(r, float(p2.sky_radius), rtol=1e-4)
