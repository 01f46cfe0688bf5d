"""relightable3dgaussians_w_tpu — TPU-native relightable 3D Gaussian splatting.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the CUDA/torch
reference `margheritacrn/relightable3dgaussians-w`: differentiable tile-based Gaussian
rasterization, Cook–Torrance SH environment-light shading with per-image in-the-wild
appearance embeddings, hemispherical sky Gaussians, adaptive density control, and
multi-chip sharding over a `jax.sharding.Mesh`.

Layout (mirrors SURVEY.md §7's design translation):
  ops/       rasterizer (preprocess / binning / compositing), Pallas kernels, knn, ssim
  models/    Gaussian pool, SH environment light, appearance nets, orchestrator
  parallel/  mesh construction + sharded training step
  utils/     SH math, camera/graphics math, losses, schedules
  data/      COLMAP / NeRF-OSR / Blender readers, cameras
"""

__version__ = "0.1.0"
