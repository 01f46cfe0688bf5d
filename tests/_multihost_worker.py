"""Worker for tests/test_multihost.py: one process of a 2-process CPU cluster.

Run as:  python _multihost_worker.py <pid> <nproc> <port> <data_dir> <out_dir>

Each process owns 4 virtual CPU devices; the 2x4=8 global devices form a
(data=4, gauss=2) mesh. Both processes execute the identical trainer schedule
(same seed -> same camera sampling); checkpoint/log IO lands on process 0 only.
"""

import os
import sys

pid, nproc, port, data_dir, out_dir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Initialize the multi-process runtime BEFORE importing the package: imports
# elsewhere in the dependency chain may touch the XLA backend, after which
# jax.distributed.initialize refuses to run. In production cli/train.py hits
# the same ordering via Relightable3DGWTrainer.__init__ being the first jax
# user; here the test harness imports more eagerly.
from types import SimpleNamespace  # noqa: E402

from relightable3dgaussians_w_tpu.parallel import multihost  # noqa: E402

multihost.maybe_initialize(SimpleNamespace(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc,
    process_id=pid))

from relightable3dgaussians_w_tpu.config import Config  # noqa: E402
from relightable3dgaussians_w_tpu.trainer import Relightable3DGWTrainer  # noqa: E402


def main():
    cfg = Config()
    cfg.dataset.source_path = data_dir
    cfg.dataset.model_path = out_dir
    cfg.optimizer.densify_from_iter = 8
    cfg.optimizer.densification_interval = 12
    cfg.optimizer.opacity_reset_interval = 20
    cfg.optimizer.reg_normal_from_iter = 0
    cfg.runtime.pool_capacity = 2048  # roomy: no pool growth mid-run
    cfg.runtime.max_dup = 1 << 14
    cfg.runtime.max_tiles_per_gauss = 16
    cfg.runtime.lmax_per_tile = 256
    cfg.runtime.tile_chunk = 4
    cfg.runtime.data_parallel = 4
    cfg.runtime.gauss_shards = 2
    cfg.runtime.coordinator_address = f"127.0.0.1:{port}"
    cfg.runtime.num_processes = nproc
    cfg.runtime.process_id = pid

    trainer = Relightable3DGWTrainer(cfg)
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    assert trainer.multiprocess and trainer.use_mesh
    assert trainer.is_main == (pid == 0)

    # 24 iters at stride B=4: densify fires (it>8, crossings of 12), opacity
    # reset fires (crossing of 20), save + evaluate_report at 24.
    trainer.train(iterations=24, save_iterations=(24,), log_every=8,
                  test_iterations=())

    # RESUME leg: a fresh trainer on every process loads the process-0-written
    # checkpoint (shared filesystem), re-pins the pool-over-gauss global
    # layout (trainer.load_checkpoint -> _reshard), and runs two more DP
    # steps — warm-start semantics, SURVEY §5.4.
    trainer2 = Relightable3DGWTrainer(cfg)
    trainer2.load_checkpoint(-1)
    assert int(trainer2.state.step) == 24, int(trainer2.state.step)
    trainer2.train(iterations=8, save_iterations=(), log_every=4,
                   test_iterations=())
    print(f"[p{pid}] done", flush=True)


if __name__ == "__main__":
    main()
