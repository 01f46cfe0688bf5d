"""Device mesh construction for multi-chip training.

The reference is strictly single-GPU (device pinned at utils/general_utils.py:155;
SURVEY.md §2.3) — every distributed capability here is additive. The scaling axes for
this workload (SURVEY.md §5.7-5.8):

* `data`  — cameras: each chip renders + backprops a different training image;
  parameter gradients are psum-reduced over ICI. This is the primary axis: the
  reference trains 1 image/step, a pod trains a batch/step.
* `gauss` — Gaussian storage: pool rows (params + Adam moments) sharded across chips
  for scenes whose Gaussians outgrow one chip's HBM; preprocess/shading are
  embarrassingly parallel over this axis, binning gathers over it.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(data: int = 1, gauss: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = data * gauss
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, gauss)
    return Mesh(arr, axis_names=("data", "gauss"))
