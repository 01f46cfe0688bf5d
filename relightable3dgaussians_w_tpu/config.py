"""Single dataclass config tree.

Collapses the reference's three overlapping config layers (Hydra YAML groups +
argparse->Hydra shim + legacy ParamGroups; SURVEY.md §5.6) into one typed tree.
Defaults mirror `configs/relightable3DG-W.yaml` + `configs/optimizer/
optimization_params.yaml` + `configs/pipe/pipeline_params.yaml` +
`configs/dataset/dataset_params.yaml` (the values actually used for training —
note the legacy `arguments/` defaults differ and are vestigial).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any


@dataclass
class ModelConfig:
    envlight_sh_degree: int = 4
    sky_sh_degree: int = 1
    init_embeddings: bool = False
    init_sh_mlp: bool = False
    embeddings_dim: int = 32
    load_iteration: int | None = None
    specular: bool = True
    fix_sky: bool = False


@dataclass
class OptimizerConfig:
    iterations: int = 40_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    opacity_lr: float = 0.05
    scaling_lr: float = 0.001
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 500
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0001
    specular_lr: float = 0.0002
    roughness_lr: float = 0.0002
    metalness_lr: float = 0.0002
    albedo_lr: float = 0.0025
    sky_radius_lr: float = 0.0001
    reg_normal_from_iter: int = 15_000
    lambda_normal: float = 0.05
    lambda_sky_gauss: float = 0.05
    reg_sky_gauss_depth_from_iter: int = 0
    lambda_sky_brdf: float = 0.5
    lambda_scale: float = 100.0
    lambda_envlight: float = 100.0
    embeddings_lr: float = 0.0002
    embednet_pretrain_epochs: int = 100
    optim_embeddings_test_iters: int = 100
    mlp_lr: float = 0.0002


@dataclass
class PipelineConfig:
    convert_SHs_python: bool = False
    compute_cov3D_python: bool = False
    debug: bool = False


@dataclass
class DatasetConfig:
    source_path: str = ""
    model_path: str = ""
    test_config_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    logger: bool = True


@dataclass
class RuntimeConfig:
    """TPU-framework-specific knobs with no reference counterpart."""
    pool_capacity: int = 0            # 0 => auto from initial point count
    pool_headroom: float = 8.0        # capacity = headroom * n_init (when auto)
    max_dup: int = 1 << 21            # rasterizer entry budget; 0 = size from
                                      # the scene's measured demand at startup
                                      # (x1.3 headroom; overflow healing still
                                      # grows it geometrically) — sort/gather/
                                      # segment-sum cost scales with this
                                      # STATIC budget, so right-sizing it is
                                      # a direct iteration-time win
    max_tiles_per_gauss: int = 64
    lmax_per_tile: int = 2048
    tile_chunk: int = 8
    pallas_chunk: int = 512           # entries per streamed composite chunk
                                      # (512 measured fastest at 800^2 on v5e)
    row_intervals: bool = False       # exact per-tile-row ellipse culling in
                                      # binning — image/grad-free; enable for
                                      # strongly anisotropic scenes (cuts
                                      # entries ~31% at 8x aniso, -9% iter
                                      # time; the interval machinery costs
                                      # ~+3% on isotropic scenes)
    row_intervals_auto: bool = True   # probe the interval-cut ratio at startup
                                      # (trainer._probe_entry_demand) and
                                      # enable row_intervals when the measured
                                      # cut >= 15% (clears the machinery cost)
    seed: int = 0
    detect_anomaly: bool = False      # the reference's --detect_anomaly
                                      # (train.py:281,318 + per-op NaN asserts,
                                      # renderutils/ops.py:107-109): enables
                                      # jax_debug_nans, which re-runs any
                                      # NaN-producing jitted step un-jitted and
                                      # raises at the originating primitive
    data_parallel: int = 0            # devices on the `data` (camera-batch) mesh
                                      # axis; 0/1 = single-device reference loop
    coordinator_address: str = ""     # multi-host: "host:port" of process 0 ->
                                      # jax.distributed.initialize before any
                                      # backend use (parallel/multihost.py);
                                      # empty = single-process
    num_processes: int = 0            # multi-host process count (0 = let jax
                                      # autodetect from the cluster environment)
    process_id: int = -1              # this process's id (-1 = autodetect)
    gauss_shards: int = 1             # devices on the `gauss` (pool-rows) axis;
                                      # >1 shards the pool + Adam moments and
                                      # renders via the tile-ownership all-to-all
    use_pallas: bool = True           # Pallas tile kernels on TPU, jnp path elsewhere
    split_dispatch: bool = True       # 3-dispatch train step (see train_step.py) —
                                      # ~2x faster on v5e; identical gradients
    profile_steps: str = ""           # "START:END" — jax.profiler trace of those steps
    tensorboard: bool = False         # mirror train scalars/images/histograms to TB
    viewer_port: int = 0              # >0: serve the network viewer during training
    viewer_ip: str = "127.0.0.1"      # (the reference's --ip/--port, train.py:279-280)
    viewer_protocol: str = "sibr"     # "sibr" (stock SIBR remote viewer) or "json"
    serve_skip_alpha: float = 1.0 / 255.0  # viewer/serving LOD threshold
                                      # (RasterizerConfig.skip_alpha): 1/255 =
                                      # exact. Measured at 1M/800^2 on v5e
                                      # (exp_r5b/c): 1/16 -> 39.6 ms/frame at
                                      # 54 dB vs exact (45.3 exact), 1/8 ->
                                      # 37.7 ms at 46 dB; aniso-8: 101.8 ->
                                      # 68.8 ms at 45 dB with 1/16
    serve_packed_rgb: bool = False    # viewer/serving: 12-bit packed R/B entry
                                      # colors (G exact) halve the frame's entry
                                      # gather (RasterizerConfig.packed_rgb);
                                      # per-channel deviation <= ~9.8e-4 (~1/4
                                      # uint8 step). False = exact colors.
    eval_halffit_views: int = 2       # test views given a short LEFT-half
                                      # embedding fit at eval iterations so the
                                      # training log tracks the PROTOCOL metric
                                      # (right-half PSNR); 0 disables


@dataclass
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    pipe: PipelineConfig = field(default_factory=PipelineConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)


def _apply_override(cfg: Any, dotted: str, value: str):
    obj = cfg
    parts = dotted.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    cur = getattr(obj, parts[-1])
    if isinstance(cur, bool):
        value = value.lower() in ("1", "true", "yes")
    elif isinstance(cur, int):
        value = int(value)
    elif isinstance(cur, float):
        value = float(value)
    elif cur is None:
        value = None if value.lower() in ("none", "null") else int(value)
    setattr(obj, parts[-1], value)


def load_config(overrides: list[str] | None = None, yaml_path: str | None = None) -> Config:
    """Build a Config from defaults + optional YAML + `a.b=c` CLI overrides
    (the single replacement for the reference's Hydra/argparse stack)."""
    cfg = Config()
    if yaml_path:
        import yaml

        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        for section, values in data.items():
            sub = getattr(cfg, section)
            for k, v in values.items():
                setattr(sub, k, v)
    for ov in overrides or []:
        key, _, val = ov.partition("=")
        _apply_override(cfg, key.strip(), val.strip())
    return cfg


def config_to_dict(cfg: Config) -> dict:
    return dataclasses.asdict(cfg)
