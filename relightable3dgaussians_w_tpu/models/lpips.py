"""LPIPS perceptual metric (VGG16 backbone), pure jnp.

TPU-native equivalent of the reference's local `lpipsPyTorch/` (modules/lpips.py:8-37,
networks.py:12-97). The environment has no network access and no torchvision, so
pretrained weights cannot be fetched here; this module implements the exact LPIPS v0.1
computation and loads weights from an npz produced once (anywhere with network) by
`convert_torch_weights`:

    feats.{i}.weight/bias   — VGG16 conv weights (torchvision vgg16 features)
    lins.{k}.weight         — LPIPS learned linear layers (1x1 convs), k in 0..4

Metric falls back gracefully: callers should check `available()` and omit LPIPS from
reports when weights are absent (PSNR/SSIM always run).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

# VGG16 feature-extractor conv layout: (layer index in torchvision .features, out_ch).
VGG16_CONVS = [
    (0, 64), (2, 64), (5, 128), (7, 128), (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512), (24, 512), (26, 512), (28, 512),
]
# Convs whose FOLLOWING relu is a tap point (relu1_2 ... relu5_3): torchvision
# .features puts each relu at conv_index + 1, so the activation is collected at
# li == conv + 1 in the layer walk below (lpips v0.1 vgg slices end at features
# indices 4/9/16/23/30 exclusive, networks.py:60-97).
VGG16_TAPS = {2: 0, 7: 1, 14: 2, 21: 3, 28: 4}
MAXPOOL_AFTER = {4, 9, 16, 23, 30}

# ImageNet normalization shift/scale used by LPIPS's ScalingLayer.
SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS = os.path.join(os.path.dirname(__file__), "_lpips_vgg16.npz")


def available(weights_path: str | None = None) -> bool:
    return os.path.exists(weights_path or DEFAULT_WEIGHTS)


def load_weights(weights_path: str | None = None) -> dict:
    return dict(np.load(weights_path or DEFAULT_WEIGHTS))


def _vgg_features(x: jnp.ndarray, w: dict) -> list[jnp.ndarray]:
    """x: [N, H, W, 3] in [-1, 1] (LPIPS convention). Returns 5 tapped activations."""
    x = (x - jnp.asarray(SHIFT)) / jnp.asarray(SCALE)
    taps = []
    layer = 0
    conv_i = 0
    h = x
    for li in range(31):
        if conv_i < len(VGG16_CONVS) and VGG16_CONVS[conv_i][0] == li:
            kernel = jnp.asarray(w[f"feats.{li}.weight"])  # torch OIHW
            bias = jnp.asarray(w[f"feats.{li}.bias"])
            kernel = jnp.transpose(kernel, (2, 3, 1, 0))   # -> HWIO
            h = jax.lax.conv_general_dilated(
                h, kernel, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            conv_i += 1
        elif li in MAXPOOL_AFTER:
            h = jax.lax.reduce_window(h, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                      (1, 2, 2, 1), "VALID")
            continue
        else:
            h = jax.nn.relu(h)
            # relu layers sit at conv_index + 1: tap relu{1_2,2_2,3_3,4_3,5_3}
            # (previously compared li itself against the conv indices — no tap
            # ever fired and the metric silently returned 0; caught by the
            # torch-twin parity test, tests/test_lpips.py).
            if (li - 1) in VGG16_TAPS:
                taps.append(h)
    assert len(taps) == 5, f"expected 5 VGG taps, got {len(taps)}"
    return taps


def lpips(img1: jnp.ndarray, img2: jnp.ndarray, weights: dict) -> jnp.ndarray:
    """LPIPS distance. img1/img2: [C, H, W] or [H, W, C] in [0, 1]."""
    def prep(x):
        if x.shape[0] in (1, 3) and x.ndim == 3 and x.shape[0] < x.shape[-1]:
            x = jnp.moveaxis(x, 0, -1)
        return (x * 2.0 - 1.0)[None]

    f1 = _vgg_features(prep(img1), weights)
    f2 = _vgg_features(prep(img2), weights)
    total = 0.0
    for k, (a, b) in enumerate(zip(f1, f2)):
        a = a * jax.lax.rsqrt(jnp.maximum(jnp.sum(a * a, -1, keepdims=True), 1e-10))
        b = b * jax.lax.rsqrt(jnp.maximum(jnp.sum(b * b, -1, keepdims=True), 1e-10))
        d = (a - b) ** 2
        lin = jnp.asarray(weights[f"lins.{k}.weight"]).reshape(-1)  # [C]
        total = total + jnp.mean(jnp.sum(d * jnp.maximum(lin, 0.0), axis=-1))
    return total


def _expected_schema() -> dict:
    """Exact npz contract for _lpips_vgg16.npz (torch OIHW conv shapes)."""
    schema = {}
    in_ch = 3
    for li, out_ch in VGG16_CONVS:
        schema[f"feats.{li}.weight"] = (out_ch, in_ch, 3, 3)
        schema[f"feats.{li}.bias"] = (out_ch,)
        in_ch = out_ch
    for k, ch in enumerate([64, 128, 256, 512, 512]):
        schema[f"lins.{k}.weight"] = (1, ch, 1, 1)
    return schema


EXPECTED_SCHEMA = _expected_schema()


def validate_weights(w: dict):
    """Loudly reject an npz that doesn't match the LPIPS v0.1 (VGG) contract —
    runs at conversion time (scripts/convert_lpips_weights.py) and at load."""
    missing = sorted(set(EXPECTED_SCHEMA) - set(w))
    if missing:
        raise ValueError(f"LPIPS weights npz missing keys: {missing[:5]}...")
    for k, shape in EXPECTED_SCHEMA.items():
        got = tuple(np.shape(w[k]))
        if got != shape:
            raise ValueError(f"LPIPS weights: {k} has shape {got}, want {shape}")


def make_lpips_fn(weights_path: str | None = None):
    """Returns a jitted lpips(img1, img2) or None if weights are unavailable."""
    if not available(weights_path):
        return None
    w = load_weights(weights_path)
    validate_weights(w)
    return jax.jit(lambda a, b: lpips(a, b, w))


def convert_torch_weights(out_path: str = DEFAULT_WEIGHTS):
    """One-time converter (run in an environment WITH torchvision + network):

        from torchvision.models import vgg16
        import lpips as lpips_pkg  # official package, or the reference's lpipsPyTorch
    saves the npz this module loads."""
    import torch
    from torchvision.models import vgg16, VGG16_Weights
    import lpips as lpips_pkg

    vgg = vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features
    model = lpips_pkg.LPIPS(net="vgg")
    out = {}
    for li, _ in VGG16_CONVS:
        out[f"feats.{li}.weight"] = vgg[li].weight.detach().numpy()
        out[f"feats.{li}.bias"] = vgg[li].bias.detach().numpy()
    for k in range(5):
        out[f"lins.{k}.weight"] = getattr(model, f"lin{k}").model[-1].weight.detach().numpy()
    np.savez(out_path, **out)
