"""Appearance networks: illumination MLP and embedding autoencoder (flax.linen).

TPU-native equivalents of the reference's `MLPNet` and `EmbeddingNet`
(scene/net_models.py:16-219). MLPNet maps a per-image appearance embedding to the
environment-light SH coefficients (head B) and sky SH coefficients (head A);
EmbeddingNet is the convolutional autoencoder used only to *initialize* per-image
embeddings by pretraining as an AE on downsized train/test images.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def he_normal_init():
    return nn.initializers.he_normal()


# Toggleable for perf bisection; f32 is the correctness default (see MLPNet).
DENSE_PRECISION = jax.lax.Precision.HIGHEST


class MLPNet(nn.Module):
    """embedding -> (envlight SH [(deg_envl+1)^2, 3], sky SH [(deg_sky+1)^2, 3]).

    Trunk: Linear(256) + Dropout(0.2) + ReLU, Linear(256) + ReLU, Linear(128) + ReLU;
    sky head: Linear; envlight head: Linear(128) + ReLU + Linear
    (net_models.py:26-52)."""

    sh_degree_envl: int = 4
    sh_degree_sky: int = 1
    embedding_dim: int = 32
    dense_layer_size: int = 256

    @nn.compact
    def __call__(self, e: jnp.ndarray, deterministic: bool = True):
        d = self.dense_layer_size
        sh_dim_envl = (self.sh_degree_envl + 1) ** 2
        sh_dim_sky = (self.sh_degree_sky + 1) ** 2
        # f32 matmuls: this net PRODUCES the per-image envlight/sky SH — TPU's
        # default bf16 dense layers inject ~0.4% noise into the lighting every
        # step (r3 TPU selfcheck leg); the layers are tiny, f32 is free.
        Dense = lambda n: nn.Dense(n, precision=DENSE_PRECISION)

        x = Dense(d)(e)
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        x = nn.relu(x)
        x = nn.relu(Dense(d)(x))
        base = nn.relu(Dense(d // 2)(x))

        sh_sky = Dense(sh_dim_sky * 3)(base).reshape(e.shape[:-1] + (sh_dim_sky, 3))

        y = nn.relu(Dense(d // 2)(base))
        sh_envl = Dense(sh_dim_envl * 3)(y).reshape(e.shape[:-1] + (sh_dim_envl, 3))
        return sh_envl, sh_sky


class EmbeddingNet(nn.Module):
    """Conv autoencoder for embedding initialization (net_models.py:81-144).

    Encoder: [Conv64, BN, ReLU] x2 + AvgPool, [Conv128, BN, ReLU] x2 + AvgPool,
    Dense -> latent. Decoder mirrors with transposed convs. `pretraining=True`
    returns the reconstruction, otherwise the latent code."""

    latent_dim: int = 32
    kernel_size: int = 3
    channels_f: int = 128
    input_shape: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray, pretraining: bool = False, train: bool = False):
        # x: [B, H, W, 3] (HWC — TPU-native layout; the reference uses CHW).
        k = (self.kernel_size, self.kernel_size)
        cf = self.channels_f
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9)

        h = nn.relu(bn()(nn.Conv(cf // 2, k, padding="SAME")(x)))
        h = nn.relu(bn()(nn.Conv(cf // 2, k, padding="SAME")(h)))
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = nn.relu(bn()(nn.Conv(cf, k, padding="SAME")(h)))
        h = nn.relu(bn()(nn.Conv(cf, k, padding="SAME")(h)))
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))  # [B, S/4, S/4, cf]

        feat = nn.Dense(self.latent_dim, kernel_init=he_normal_init())(h.reshape(h.shape[0], -1))
        if not pretraining:
            return feat

        s4 = self.input_shape // 4
        d = nn.Dense(cf * s4 * s4, kernel_init=he_normal_init())(feat)
        d = d.reshape(-1, s4, s4, cf)
        d = nn.relu(bn()(nn.ConvTranspose(cf, k, strides=(2, 2), padding="SAME")(d)))
        d = nn.relu(bn()(nn.ConvTranspose(cf // 2, k, padding="SAME")(d)))
        d = nn.relu(bn()(nn.ConvTranspose(cf // 2, k, strides=(2, 2), padding="SAME")(d)))
        d = nn.relu(bn()(nn.ConvTranspose(3, k, padding="SAME")(d)))
        return d


def init_mlp(key, mlp: MLPNet):
    e = jnp.zeros((1, mlp.embedding_dim))
    return mlp.init({"params": key}, e, deterministic=True)["params"]


def init_embedding_net(key, net: EmbeddingNet):
    x = jnp.zeros((1, net.input_shape, net.input_shape, 3))
    variables = net.init({"params": key}, x, pretraining=True, train=False)
    return variables  # contains params + batch_stats


def init_embeddings(key, num_images: int, dim: int = 32) -> jnp.ndarray:
    """The torch.nn.Embedding(num_train_images, 32) table
    (relit3DGW_model.py:59-73); normal(0, 1) init like torch's default."""
    return jax.random.normal(key, (num_images, dim))
