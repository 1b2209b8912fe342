"""Multi-host data/state placement (SURVEY §5.8, reference train.py:42-55
rebuild): host_batch_slice semantics, and a REAL 2-process jax.distributed
train step over a 4-device virtual mesh."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from flowavenet_tpu.parallel.multihost import host_batch_slice


def test_host_batch_slice_single_process():
    # in-process (1 host): the slice is the whole batch
    assert host_batch_slice(8) == slice(0, 8)


def test_host_batch_slice_multi_process(monkeypatch):
    import flowavenet_tpu.parallel.multihost as mh

    monkeypatch.setattr(mh.jax, "process_count", lambda: 4)
    monkeypatch.setattr(mh.jax, "process_index", lambda: 2)
    assert host_batch_slice(8) == slice(4, 6)
    with pytest.raises(ValueError, match="not divisible"):
        host_batch_slice(7)


def test_two_process_train_step(tmp_path):
    """Two jax.distributed CPU processes run one SPMD train step through
    the production input path (host_batch_slice + make_global_batch +
    put_tree); losses must agree and be finite."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""  # let the worker's config pick cpu
    # the worker must import the repo regardless of how pytest found it
    # (pytest inserts the rootdir into ITS OWN sys.path, not the child's)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    procs = [
        subprocess.Popen([sys.executable, worker, str(port), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("LOSS")][-1]
        parts = line.split()
        losses.append(float(parts[1]))
        assert int(parts[3]) == 2
    assert np.isfinite(losses[0])
    assert losses[0] == losses[1], losses
