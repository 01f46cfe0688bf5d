"""LPIPS v0.1 (VGG) graph parity: the jnp implementation vs an independent
torch twin, on SYNTHETIC shape-correct weights.

The environment cannot produce the pretrained npz (no torchvision/network), so
the numeric pipeline itself — ImageNet scaling layer -> 13-conv VGG16 feature
stack with taps after relu{1_2,2_2,3_3,4_3,5_3} -> channel unit-normalization ->
learned 1x1 lin layers -> spatial mean -> sum over taps — was previously
UNTESTED (VERDICT r4 item 7 / missing #3). This builds the same computation in
torch following the reference's lpipsPyTorch (modules/lpips.py:8-37,
networks.py:12-97, torchvision vgg16 .features layout) and checks outputs agree
on random weights + images. Also pins the metrics CLI's explicit
`"lpips": null` + reason contract when weights are absent.
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from relightable3dgaussians_w_tpu.models.lpips import (
    EXPECTED_SCHEMA, SHIFT, SCALE, lpips, make_lpips_fn, validate_weights)


def synth_weights(seed=0, scale=0.05):
    """Shape-correct random weights npz dict (the checked-in fixture is
    generated, not binary: same schema as convert_torch_weights output)."""
    rng = np.random.RandomState(seed)
    w = {}
    for k, shape in EXPECTED_SCHEMA.items():
        if k.endswith(".bias"):
            # small positive biases keep some activations past the relus
            w[k] = np.abs(rng.standard_normal(shape) * scale).astype(np.float32)
        else:
            # fan-in scaling: ~unit activation gain through all 13 conv layers
            fan_in = float(np.prod(shape[1:]))
            w[k] = (rng.standard_normal(shape) / np.sqrt(fan_in)).astype(
                np.float32)
    return w


def torch_lpips_twin(img1, img2, w):
    """Independent torch implementation of LPIPS v0.1 (VGG backbone).

    Mirrors lpipsPyTorch/modules/lpips.py:26-37 (normalize -> net -> lin ->
    spatial average -> sum) and networks.py:60-97 (VGG16 slices at torchvision
    .features indices 0-30 with maxpools at {4,9,16,23,30}); scaling layer
    constants from networks.py get_network/LinLayers usage."""

    # Independent layer walk (do NOT mirror the module's loop): the exact
    # torchvision vgg16 .features sequence with lpips v0.1's slice boundaries —
    # convs at {0,2,5,7,10,12,14,17,19,21,24,26,28}, relu after every conv,
    # maxpool at {4,9,16,23,30}, taps at the relus ending each slice:
    # relu1_2=3, relu2_2=8, relu3_3=15, relu4_3=22, relu5_3=29.
    CONV_AT = {0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28}
    POOL_AT = {4, 9, 16, 23, 30}
    TAP_AT = {3, 8, 15, 22, 29}

    def features(x):
        # x: [1, 3, H, W] in [-1, 1]
        shift = torch.tensor(SHIFT).view(1, 3, 1, 1)
        scale = torch.tensor(SCALE).view(1, 3, 1, 1)
        h = (x - shift) / scale
        taps = []
        for li in range(31):
            if li in CONV_AT:
                h = F.conv2d(h, torch.tensor(w[f"feats.{li}.weight"]),
                             torch.tensor(w[f"feats.{li}.bias"]), padding=1)
            elif li in POOL_AT:
                h = F.max_pool2d(h, 2, 2)
            else:
                h = F.relu(h)
                if li in TAP_AT:
                    taps.append(h)
        assert len(taps) == 5
        return taps

    def unit_norm(t):
        return t / torch.sqrt(torch.clamp((t * t).sum(1, keepdim=True),
                                          min=1e-10))

    x1 = torch.tensor(np.moveaxis(img1, -1, 0)[None] * 2.0 - 1.0)
    x2 = torch.tensor(np.moveaxis(img2, -1, 0)[None] * 2.0 - 1.0)
    total = 0.0
    for k, (a, b) in enumerate(zip(features(x1), features(x2))):
        d = (unit_norm(a) - unit_norm(b)) ** 2
        lin = torch.clamp(torch.tensor(w[f"lins.{k}.weight"]).view(1, -1, 1, 1),
                          min=0.0)
        total = total + (d * lin).sum(1).mean()
    return float(total)


def test_lpips_matches_torch_twin():
    w = synth_weights(seed=0)
    validate_weights(w)
    rng = np.random.RandomState(1)
    img1 = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(np.float32)

    got = float(lpips(jnp.asarray(img1), jnp.asarray(img2), w))
    want = torch_lpips_twin(img1, img2, w)
    assert np.isfinite(got) and got > 0
    assert abs(got - want) <= 1e-4 * max(abs(want), 1e-3), (got, want)

    # identical inputs -> exactly zero distance
    same = float(lpips(jnp.asarray(img1), jnp.asarray(img1), w))
    assert same == pytest.approx(0.0, abs=1e-8)


def test_lpips_chw_and_hwc_agree():
    w = synth_weights(seed=2)
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    d_hwc = float(lpips(jnp.asarray(a), jnp.asarray(b), w))
    d_chw = float(lpips(jnp.moveaxis(jnp.asarray(a), -1, 0),
                        jnp.moveaxis(jnp.asarray(b), -1, 0), w))
    assert d_hwc == pytest.approx(d_chw, rel=1e-6)


def test_make_lpips_fn_from_npz(tmp_path):
    path = str(tmp_path / "w.npz")
    np.savez(path, **synth_weights(seed=4))
    fn = make_lpips_fn(path)
    assert fn is not None
    rng = np.random.RandomState(5)
    a = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    assert float(fn(a, b)) > 0
    # absent weights -> None (callers emit the explicit null)
    assert make_lpips_fn(str(tmp_path / "missing.npz")) is None


def test_validate_rejects_wrong_shapes():
    w = synth_weights(seed=6)
    w["lins.0.weight"] = w["lins.0.weight"][:, :32]
    with pytest.raises(ValueError, match="shape"):
        validate_weights(w)
    del w["lins.0.weight"]
    with pytest.raises(ValueError, match="missing"):
        validate_weights(w)


def test_metrics_cli_reports_null_lpips_with_reason(tmp_path):
    """metrics.evaluate_dir: when weights are absent every per-view entry and
    the summary carry `"lpips": null` plus a reason string (json null, not a
    silently missing key)."""
    from PIL import Image

    from relightable3dgaussians_w_tpu.cli.metrics import evaluate_dir

    renders = tmp_path / "renders"
    gts = tmp_path / "gts"
    renders.mkdir()
    gts.mkdir()
    rng = np.random.RandomState(0)
    img = (rng.uniform(0, 1, (16, 16, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(renders / "v0.png")
    Image.fromarray(img).save(gts / "v0.png")

    res = evaluate_dir(str(renders), str(gts))
    assert res["per_view"]["v0"]["lpips"] is None
    assert res["summary"]["lpips"] is None
    assert "weights unavailable" in res["summary"]["lpips_reason"]
    # the contract survives json round-tripping as null
    assert json.loads(json.dumps(res))["summary"]["lpips"] is None
