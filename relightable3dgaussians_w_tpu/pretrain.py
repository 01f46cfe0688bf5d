"""Initialization pretraining: embedding autoencoder + SH-MLP priors.

TPU-native equivalent of the reference's `EmbeddingNet.optimize`
(scene/net_models.py:155-219, with data/dataloader_net.py transforms: 256x256 resize
+ sigma-0.1 clipped Gaussian noise on the train split), the embedding encoding pass
(relit3DGW_model.py:84-123: encode, L2-normalize) and `MLPNet.initialize_sh_envl`
supervised pretraining against per-lighting-condition SH priors
(net_models.py:64-78, relit3DGW_model.py:126-136).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
from PIL import Image

from .models.nets import EmbeddingNet, MLPNet, init_embedding_net


def _load_resized_images(path: str, size: int = 256) -> np.ndarray:
    imgs = []
    for name in sorted(os.listdir(path)):
        with Image.open(os.path.join(path, name)) as im:
            im = im.convert("RGB").resize((size, size))
            imgs.append(np.asarray(im, np.float32) / 255.0)
    return np.stack(imgs)


def pretrain_embedding_net(key, train_images: np.ndarray, test_images: np.ndarray | None = None,
                           num_epochs: int = 100, batch_size: int = 32,
                           latent_dim: int = 32, noise_sigma: float = 0.1,
                           log_every: int = 10):
    """AE pretraining: MSE reconstruction of noisy 256x256 images, Adam(1e-3,
    wd 1e-5), grad-norm clip 1 (net_models.py:147-181).

    Args:
        train_images: [N, 256, 256, 3].
    Returns:
        (net, variables) — trained EmbeddingNet + {params, batch_stats}.
    """
    net = EmbeddingNet(latent_dim=latent_dim, input_shape=train_images.shape[1])
    key, k_init = jax.random.split(key)
    variables = init_embedding_net(k_init, net)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(1e-3, weight_decay=1e-5),
    )
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, batch, k):
        noisy = jnp.clip(batch + jax.random.normal(k, batch.shape) * noise_sigma, 0, 1)

        def loss_fn(p):
            recon, updates = net.apply(
                {"params": p, "batch_stats": batch_stats}, noisy, pretraining=True,
                train=True, mutable=["batch_stats"],
            )
            return jnp.mean((recon - batch) ** 2), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    params = variables["params"]
    batch_stats = variables["batch_stats"]
    n = len(train_images)
    rng = np.random.RandomState(0)
    for epoch in range(num_epochs):
        order = rng.permutation(n)
        losses = []
        for i in range(0, n, batch_size):
            idx = order[i : i + batch_size]
            if len(idx) == 0:
                continue
            key, k = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, jnp.asarray(train_images[idx]), k
            )
            losses.append(float(loss))
        if (epoch + 1) % log_every == 0:
            print(f"[embednet epoch {epoch + 1}] train mse {np.mean(losses):.5f}")
    return net, {"params": params, "batch_stats": batch_stats}


def encode_embeddings(net: EmbeddingNet, variables, images: np.ndarray,
                      batch: int = 16) -> jnp.ndarray:
    """Encode images to L2-normalized latent embeddings (relit3DGW_model.py:108-123)."""
    apply = jax.jit(lambda x: net.apply(variables, x, pretraining=False, train=False))
    outs = [np.asarray(apply(jnp.asarray(images[i : i + batch])))
            for i in range(0, len(images), batch)]
    z = np.concatenate(outs, axis=0)
    z = z / np.maximum(np.linalg.norm(z, axis=-1, keepdims=True), 1e-12)
    return jnp.asarray(z)


def initialize_embeddings_from_dataset(key, source_path: str, latent_dim: int = 32,
                                       num_epochs: int = 100, test: bool = False):
    """Full embedding-init pipeline for a NeRF-OSR layout dataset."""
    train_imgs = _load_resized_images(os.path.join(source_path, "train/rgb"))
    net, variables = pretrain_embedding_net(key, train_imgs, num_epochs=num_epochs,
                                            latent_dim=latent_dim)
    target = train_imgs if not test else _load_resized_images(os.path.join(source_path, "test/rgb"))
    return encode_embeddings(net, variables, target), (net, variables)


def lighting_condition_of(image_name: str) -> str:
    """Lighting-condition prefix of a NeRF-OSR image name
    (relit3DGW_model.py:129)."""
    return image_name[:3] if image_name.startswith("C") else image_name[:-9]


def initialize_sh_mlp(key, mlp: MLPNet, mlp_params, embeddings: jnp.ndarray,
                      image_names: list[str], sh_priors: dict[str, np.ndarray],
                      epochs: int = 100, batch_size: int = 32):
    """Supervised MSE pretraining of the MLP's envlight head against per-image SH
    priors matched by lighting-condition prefix (net_models.py:64-78,
    relit3DGW_model.py:126-136). Adam lr 2e-3, grad clip 1."""
    n_coeff = (mlp.sh_degree_envl + 1) ** 2
    targets = []
    for name in image_names:
        lc = lighting_condition_of(name)
        k = next((p for p in sh_priors if lc in p), None)
        if k is None:
            raise KeyError(f"no SH prior for lighting condition {lc!r}")
        targets.append(np.asarray(sh_priors[k])[:n_coeff])
    targets = jnp.asarray(np.stack(targets), jnp.float32)

    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-3))
    opt_state = tx.init(mlp_params)

    @jax.jit
    def step(params, opt_state, e, t, k):
        def loss_fn(p):
            sh_out, _ = mlp.apply({"params": p}, e, deterministic=False,
                                  rngs={"dropout": k})
            return jnp.mean((sh_out - t) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    n = embeddings.shape[0]
    rng = np.random.RandomState(0)
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n, batch_size):
            idx = order[i : i + batch_size]
            key, k = jax.random.split(key)
            mlp_params, opt_state, _ = step(mlp_params, opt_state,
                                            embeddings[idx], targets[idx], k)
    return mlp_params
