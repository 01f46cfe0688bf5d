"""BSDF op parity vs the reference's python twins (the renderutils twin-test
pattern, scene/NVDIFFREC/renderutils/tests/test_bsdf.py): same random inputs, same
outputs AND same input gradients (torch autograd vs jax autodiff)."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relightable3dgaussians_w_tpu.ops import bsdf as B

REF = "/root/reference"
has_ref = os.path.isdir(REF)

if has_ref:
    sys.path.insert(0, os.path.join(REF, "scene/NVDIFFREC/renderutils"))


def rand(shape, seed):
    return np.random.RandomState(seed).uniform(-1, 1, shape).astype(np.float32)


def rand01(shape, seed):
    return np.random.RandomState(seed).uniform(0.05, 1, shape).astype(np.float32)


@pytest.mark.skipif(not has_ref, reason="reference checkout not available")
def test_pbr_bsdf_parity_with_grads():
    import torch
    import bsdf as ref_bsdf

    n = 64
    kd = rand01((n, 3), 0)
    arm = rand01((n, 3), 1)
    pos = rand((n, 3), 2)
    nrm = rand((n, 3), 3)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    view_pos = pos + np.abs(rand((n, 3), 4)) + 0.5
    light_pos = pos + np.abs(rand((n, 3), 5)) + 0.5

    for bsdf_mode in (0, 1):
        t_args = [torch.tensor(a, requires_grad=True) for a in
                  (kd, arm, pos, nrm, view_pos, light_pos)]
        ref = ref_bsdf.bsdf_pbr(*t_args, 0.08, bsdf_mode)
        target = torch.tensor(rand((n, 3), 6))
        loss = ((ref - target) ** 2).sum()
        loss.backward()

        def jloss(*args):
            out = B.pbr_bsdf(*args, min_roughness=0.08, bsdf=bsdf_mode)
            return jnp.sum((out - jnp.asarray(np.asarray(target))) ** 2)

        j_args = [jnp.asarray(a) for a in (kd, arm, pos, nrm, view_pos, light_pos)]
        jout = B.pbr_bsdf(*j_args, min_roughness=0.08, bsdf=bsdf_mode)
        np.testing.assert_allclose(np.asarray(jout), ref.detach().numpy(),
                                   rtol=1e-4, atol=1e-5)
        grads = jax.grad(jloss, argnums=tuple(range(6)))(*j_args)
        for name, t_arg, g in zip(("kd", "arm", "pos", "nrm", "view_pos", "light_pos"),
                                  t_args, grads):
            np.testing.assert_allclose(np.asarray(g), t_arg.grad.numpy(),
                                       rtol=1e-3, atol=1e-4,
                                       err_msg=f"grad mismatch: {name} bsdf={bsdf_mode}")


@pytest.mark.skipif(not has_ref, reason="reference checkout not available")
def test_prepare_shading_normal_parity():
    import torch
    import bsdf as ref_bsdf

    n = 64
    pos = rand((n, 3), 0)
    view_pos = rand((n, 3), 1) * 3
    perturbed = rand01((n, 3), 2)
    smooth_nrm = rand((n, 3), 3)
    smooth_tng = rand((n, 3), 4)
    geom_nrm = rand((n, 3), 5)
    for two_sided in (True, False):
        for opengl in (True, False):
            ref = ref_bsdf.bsdf_prepare_shading_normal(
                *[torch.tensor(a) for a in (pos, view_pos, perturbed, smooth_nrm,
                                            smooth_tng, geom_nrm)],
                two_sided, opengl).numpy()
            got = np.asarray(B.prepare_shading_normal(
                *[jnp.asarray(a) for a in (pos, view_pos, perturbed, smooth_nrm,
                                           smooth_tng, geom_nrm)],
                two_sided, opengl))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.skipif(not has_ref, reason="reference checkout not available")
def test_individual_ops_parity():
    import torch
    import bsdf as ref_bsdf

    n = 128
    nrm = rand((n, 3), 0)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    wi = rand((n, 3), 1)
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = rand((n, 3), 2)
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    a2 = rand01((n, 1), 3)
    ct = rand01((n, 1), 4)

    pairs = [
        (B.lambert(jnp.asarray(nrm), jnp.asarray(wi)),
         ref_bsdf.bsdf_lambert(torch.tensor(nrm), torch.tensor(wi))),
        (B.ndf_ggx(jnp.asarray(a2), jnp.asarray(ct)),
         ref_bsdf.bsdf_ndf_ggx(torch.tensor(a2), torch.tensor(ct))),
        (B.lambda_ggx(jnp.asarray(a2), jnp.asarray(ct)),
         ref_bsdf.bsdf_lambda_ggx(torch.tensor(a2), torch.tensor(ct))),
        (B.masking_smith(jnp.asarray(a2), jnp.asarray(ct), jnp.asarray(ct[::-1].copy())),
         ref_bsdf.bsdf_masking_smith_ggx_correlated(
             torch.tensor(a2), torch.tensor(ct), torch.tensor(ct[::-1].copy()))),
        (B.phong(jnp.asarray(nrm), jnp.asarray(wo), jnp.asarray(wi), 8.0),
         ref_bsdf.bsdf_phong(torch.tensor(nrm), torch.tensor(wo), torch.tensor(wi), 8.0)),
        (B.frostbite(jnp.asarray(nrm), jnp.asarray(wi), jnp.asarray(wo), jnp.asarray(a2)),
         ref_bsdf.bsdf_frostbite(torch.tensor(nrm), torch.tensor(wi), torch.tensor(wo),
                                 torch.tensor(a2))),
    ]
    for i, (got, ref) in enumerate(pairs):
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4,
                                   atol=1e-5, err_msg=f"op {i}")
