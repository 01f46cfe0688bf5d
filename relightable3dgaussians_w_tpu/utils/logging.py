"""Training observability: JSONL metrics, optional TensorBoard, jax.profiler traces.

TPU-native upgrade of the reference's logging stack (SURVEY.md §5.1/§5.5): the
reference writes TensorBoard scalars (l1/total loss/psnr/iter_time/total_points,
train.py:180-195), image panels and opacity/roughness/metalness histograms
(train.py:224-263), and times iterations with paired CUDA events (train.py:49-56).
Here the always-on sink is a JSONL file (machine-readable, no deps); TensorBoard is
mirrored opportunistically via torch.utils.tensorboard when enabled; per-iteration
timing is host wall-clock around the jitted step (the step is synchronous at the
metric pull), and `jax.profiler` traces replace CUDA events for kernel-level drilldown
(runtime.profile_steps="START:END").
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax


class TrainLogger:
    """JSONL + optional TensorBoard scalar/histogram/image logger."""

    def __init__(self, jsonl_path: str, tb_dir: str | None = None):
        self.jsonl_path = jsonl_path
        self.tb = None
        if tb_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(tb_dir)
            except Exception as e:  # pragma: no cover - env without TB
                print(f"tensorboard unavailable ({e}); JSONL logging only")

    def scalars(self, step: int, values: dict):
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(dict(iter=step, **values)) + "\n")
        if self.tb is not None:
            for k, v in values.items():
                if isinstance(v, (int, float)):
                    self.tb.add_scalar(f"train_patches/{k}", v, step)

    def histogram(self, step: int, name: str, values):
        if self.tb is not None:
            self.tb.add_histogram(f"scene/{name}_histogram",
                                  np.asarray(values), step)

    def image(self, step: int, name: str, hwc):
        """hwc: [H, W, C] float image in [0, 1]."""
        if self.tb is not None:
            img = np.clip(np.asarray(hwc), 0.0, 1.0)
            self.tb.add_image(name, img.transpose(2, 0, 1), step)

    def close(self):
        if self.tb is not None:
            self.tb.flush()
            self.tb.close()


class ProfilerWindow:
    """Start/stop a jax.profiler trace over a step window ("START:END")."""

    def __init__(self, spec: str, out_dir: str):
        self.start_step = self.end_step = -1
        self.out_dir = out_dir
        self._active = False
        if spec:
            a, b = spec.split(":")
            self.start_step, self.end_step = int(a), int(b)

    def step(self, it: int):
        if it == self.start_step and not self._active:
            jax.profiler.start_trace(self.out_dir)
            self._active = True
        if it == self.end_step and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace for steps [{self.start_step}, {self.end_step}) "
                  f"written to {self.out_dir}")

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """EMA per-iteration wall time (the reference's iter_time scalar)."""

    def __init__(self, beta: float = 0.9):
        self.beta = beta
        self.ema_ms = 0.0
        self._t = None

    def tic(self):
        self._t = time.perf_counter()

    def toc(self) -> float:
        dt = (time.perf_counter() - self._t) * 1e3
        self.ema_ms = dt if self.ema_ms == 0.0 else (
            self.beta * self.ema_ms + (1 - self.beta) * dt)
        return dt
