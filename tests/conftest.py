"""Test harness: force an 8-device virtual CPU mesh so sharding logic runs without a
TPU pod (SURVEY.md §4 item 5). Must run before any jax computation."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
