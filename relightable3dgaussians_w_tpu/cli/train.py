"""Training CLI — the reference's `train.py` driver.

Usage:
    python -m relightable3dgaussians_w_tpu.cli.train dataset.source_path=/data/lk2 \
        dataset.model_path=./output/lk2 dataset.eval=true [key=value ...]
"""

from __future__ import annotations

import sys

from ..config import load_config


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    yaml_path = None
    overrides = []
    for a in argv:
        if a.startswith("--config="):
            yaml_path = a.split("=", 1)[1]
        else:
            overrides.append(a)
    cfg = load_config(overrides, yaml_path)

    # Multi-host init FIRST: jax.distributed.initialize must run before any
    # import touches the XLA backend (parallel/multihost.py). No-op when
    # runtime.coordinator_address is unset.
    from ..parallel import multihost

    multihost.maybe_initialize(cfg.runtime)

    from ..trainer import Relightable3DGWTrainer
    from ..pretrain import initialize_embeddings_from_dataset, initialize_sh_mlp
    import jax

    trainer = Relightable3DGWTrainer(cfg)

    if cfg.model.init_embeddings:
        key = jax.random.PRNGKey(cfg.runtime.seed + 1)
        emb, _ = initialize_embeddings_from_dataset(
            key, cfg.dataset.source_path, cfg.model.embeddings_dim,
            cfg.optimizer.embednet_pretrain_epochs,
        )
        trainer.state = trainer.state._replace(
            params=dict(trainer.state.params, embeddings=emb)
        )
    if cfg.model.init_sh_mlp:
        import os
        import numpy as np

        prior_dir = f"{cfg.dataset.source_path}/train/envmaps_init"
        priors = {f: np.load(f"{prior_dir}/{f}") for f in sorted(os.listdir(prior_dir))
                  if f.endswith(".npy")}
        names = [v["cam"].image_name for v in trainer.train_views]
        mlp_params = initialize_sh_mlp(
            jax.random.PRNGKey(cfg.runtime.seed + 2), trainer.mlp,
            trainer.state.params["mlp"], trainer.state.params["embeddings"], names,
            priors,
        )
        trainer.state = trainer.state._replace(
            params=dict(trainer.state.params, mlp=mlp_params)
        )

    trainer.train()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
