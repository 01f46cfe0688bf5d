"""Multi-host training: 2 processes x 4 virtual CPU devices, one global
(data=4, gauss=2) mesh, cross-process collectives over gloo.

VERDICT r4 item 2: the north star asks for >=80% multi-host scaling efficiency
(BASELINE.md) and SURVEY §5.8 names DCN/pjit multi-host, but nothing could
initialize a multi-process runtime. This spawns a real 2-process cluster against
a local coordinator (`jax.distributed.initialize` via
parallel/multihost.maybe_initialize) and runs the ACTUAL trainer — DP step on
the fused data x gauss path, densification, opacity reset, collective
host-replication pull, and a checkpoint written by process 0 only.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_trainer_e2e import make_dataset

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "_multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_trains_and_checkpoints(tmp_path):
    data = str(tmp_path / "scene")
    make_dataset(data, n_views=4)
    out = str(tmp_path / "out_mh")
    port = _free_port()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(pid), "2", str(port), data, out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o)
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{o[-4000:]}"
        assert f"[p{pid}] done" in o

    # Checkpoint written once, by process 0, in the reference layout.
    assert os.path.exists(os.path.join(out, "point_cloud", "iteration_24",
                                       "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "full_state", "iteration_24",
                                       "state.npz"))
    # Training log exists (process 0) with finite metrics through the schedule.
    log = os.path.join(out, "train_log.jsonl")
    with open(log) as f:
        recs = [json.loads(l) for l in f]
    psnrs = [r["psnr"] for r in recs if "psnr" in r]
    assert psnrs and all(np.isfinite(p) for p in psnrs)
    # The collective eval report ran on process 0 at the final iteration.
    assert any("train_psnr" in r for r in recs), recs
