"""Multi-host scale-out test: 2 processes × 4 virtual CPU devices run the
full sharded training step over one global 8-device mesh with per-process
data loading (parallel/distributed.py; SURVEY §2.3 "DCN inter-slice via
jax.distributed"). Each worker is a subprocess because jax.distributed is
per-process global state.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from mask_yolo_tpu.parallel import distributed

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_training_step():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "MYOLO_COORDINATOR": f"localhost:{port}",
            "MYOLO_NUM_PROCESSES": "2",
            "MYOLO_PROCESS_ID": str(pid),
            # isolate from the parent test session's JAX settings
            "XLA_FLAGS": "",
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=560)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)
    losses = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        _, loss, ndev = line.split()
        assert int(ndev) == 8
        losses.append(float(loss))
    # SPMD: every process computes the same global loss
    assert np.isfinite(losses).all()
    assert abs(losses[0] - losses[1]) < 1e-6, losses


def test_local_image_ids_partition():
    ids = np.arange(10)
    a = distributed.local_image_ids(ids, 0, 2)
    b = distributed.local_image_ids(ids, 1, 2)
    assert len(a) == len(b) == 5
    assert set(a) | set(b) == set(range(10))
    assert not set(a) & set(b)
    # remainder dropped to keep counts equal
    c = distributed.local_image_ids(np.arange(7), 0, 3)
    d = distributed.local_image_ids(np.arange(7), 2, 3)
    assert len(c) == len(d) == 2
    with pytest.raises(ValueError):
        distributed.local_image_ids(np.arange(2), 0, 3)


def test_initialize_single_process_noop():
    # no env triplet, no cluster: must not raise, reports this process only
    pidx, pcnt = distributed.initialize()
    assert pidx == 0 and pcnt == 1
