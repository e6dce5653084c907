"""Multi-process (multi-host) training test.

Mirrors the reference's clusterless distributed tests
(cpu_training_distributed_test_binary.py + estimator_dist_test.py): spawn one
JAX process per "host" with gloo CPU collectives and run MultiHostTrainer —
fid a2a to owners, host-map io_callback, embedding a2a, grad a2a.
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_training():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=root)
    env.pop("XLA_FLAGS", None)  # workers manage their own device config
    worker = os.path.join(root, "tests", "multihost_worker.py")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), "30"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = [p.communicate(timeout=550)[0] for p in procs]
    results = {}
    for out in outs:
        m = re.search(r"RESULT (\d) first=([\d.]+) last=([\d.]+) "
                      r"local_store_sizes=\[(\d+), (\d+)\]", out)
        assert m, f"worker output missing RESULT line:\n{out[-2000:]}"
        pid = int(m.group(1))
        results[pid] = (float(m.group(2)), float(m.group(3)),
                        int(m.group(4)), int(m.group(5)))
    # pmean'd losses must agree across processes and decrease
    assert abs(results[0][0] - results[1][0]) < 1e-6
    assert abs(results[0][1] - results[1][1]) < 1e-6
    assert results[0][1] < results[0][0]
    # shard ownership: process p's host map holds only shard p's ids
    assert results[0][2] > 0 and results[0][3] == 0
    assert results[1][2] == 0 and results[1][3] > 0
