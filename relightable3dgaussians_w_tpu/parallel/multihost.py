"""Multi-host (multi-process) runtime: jax.distributed init + global-array feeding.

New capability with no reference counterpart (the reference is single-GPU
single-process, utils/general_utils.py:155; SURVEY.md §2.3/§5.8): one
jax.sharding.Mesh spanning every process's devices, with

* `maybe_initialize(runtime)` — `jax.distributed.initialize` from the
  `runtime.coordinator_address` / `num_processes` / `process_id` config knobs
  (or their standard env fallbacks). Call ONCE, before any backend use.
* `global_batch(tree, mesh, spec_fn)` — lift host-replicated numpy pytrees into
  global jax.Arrays via `jax.make_array_from_callback`: every process holds the
  full batch on host (each host reads the same dataset) and contributes only the
  shards its local devices own. This is the multi-controller analog of the
  single-process `device_put(batch, NamedSharding(...))`.
* `host_replicated(tree, mesh)` — COLLECTIVE pull of (possibly gauss/data-
  sharded) device state to host numpy on every process: an out_shardings=P()
  identity jit (XLA all-gathers over ICI/DCN), then np.asarray on the now
  fully-addressable result. Checkpoint/eval IO then runs on process 0 only.
* `is_main()` — `jax.process_index() == 0`; gates file IO and logging.

On the CPU backend (the 2-process test cluster, tests/test_multihost.py) the
cross-process collectives ride gloo; on TPU pods the same code lowers to
ICI/DCN collectives — nothing here is backend-specific.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize(runtime) -> bool:
    """Initialize the multi-process runtime when configured; idempotent.

    Returns True iff running multi-process after the call. Reads
    `runtime.coordinator_address` (e.g. "10.0.0.1:8476"), `runtime.num_processes`
    and `runtime.process_id`; a process_id of -1 defers to jax's automatic
    cluster detection (TPU pod metadata / Slurm env)."""
    global _initialized
    addr = getattr(runtime, "coordinator_address", "") or ""
    if not addr:
        # Not configured for multi-host; the caller will use jax normally.
        return jax.process_count() > 1
    if _initialized:
        return True
    # NOTE: nothing before jax.distributed.initialize may touch the backend —
    # even jax.process_count()/jax.default_backend() initialize XLA and make
    # initialize() unusable.
    # CPU cross-process collectives need an explicit implementation. Inspect
    # the CONFIG, not jax.default_backend(): querying the backend would
    # initialize it, after which jax.distributed.initialize refuses to run.
    platforms = getattr(jax.config, "jax_platforms", None) or ""
    if "cpu" in platforms:
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
    kwargs = dict(coordinator_address=addr)
    if getattr(runtime, "num_processes", 0) > 0:
        kwargs["num_processes"] = runtime.num_processes
    if getattr(runtime, "process_id", -1) >= 0:
        kwargs["process_id"] = runtime.process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def is_main() -> bool:
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def put_global(x, sharding: NamedSharding):
    """Place a host-replicated numpy/jax array onto a (possibly multi-process)
    sharding. Single-process: plain device_put. Multi-process: every process
    holds the full value and `make_array_from_callback` slices out the shards
    its local devices own — no cross-host transfer."""
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def global_batch(tree, mesh: Mesh, spec_fn=None):
    """Lift a host pytree into global arrays. spec_fn maps leaf -> PartitionSpec
    (default: P() replicated)."""
    spec_fn = spec_fn or (lambda a: P())
    return jax.tree_util.tree_map(
        lambda a: put_global(a, NamedSharding(mesh, spec_fn(a))), tree)


def host_replicated(tree, mesh: Mesh | None):
    """COLLECTIVE: gather a sharded device pytree to host numpy on every process.

    Every process MUST call this (the replication is an XLA collective); the
    result is fully addressable everywhere, so np.asarray is safe. With no mesh
    (single-device path) it is a plain device_get."""
    if mesh is None or not is_multiprocess():
        return jax.tree_util.tree_map(lambda a: np.asarray(a), tree)
    rep = NamedSharding(mesh, P())

    def pull(a):
        if not isinstance(a, jax.Array):
            return np.asarray(a)
        return np.asarray(jax.jit(lambda x: x, out_shardings=rep)(a))

    return jax.tree_util.tree_map(pull, tree)


def sync_processes(name: str = "barrier"):
    """Barrier: all processes reach `name` before any proceeds (used around
    checkpoint writes so non-main processes don't race ahead into a re-jit
    while main is writing)."""
    if not is_multiprocess():
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
