"""Multi-host wiring tests for parallel/distributed.py.

The single-process no-op path runs in-process; the real coordination
path is exercised by spawning a genuine 2-process CPU cluster over a
localhost coordinator (jax.distributed supports multi-process CPU), so
`initialize` is tested as actual multi-host support, not just glue.
"""
import os
import socket
import subprocess
import sys

import pytest


def test_initialize_noop_single_process():
    from graph_pde_tpu.parallel import initialize, is_multiprocess

    initialize()  # no coordinator configured -> must not raise
    initialize()  # idempotent
    assert is_multiprocess() is False


_WORKER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from graph_pde_tpu.parallel import initialize, is_multiprocess

pid = int(sys.argv[1])
initialize(coordinator_address=sys.argv[2], num_processes=2,
           process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert is_multiprocess() is True

import jax.numpy as jnp
from jax.experimental import multihost_utils

x = jnp.ones(()) * (pid + 1)
gathered = multihost_utils.process_allgather(x)
total = float(gathered.sum())
assert total == 3.0, total
print("WORKER_OK", pid, flush=True)
"""


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    addr = f"localhost:{port}"
    env = dict(os.environ)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process is enough

    procs = [
        subprocess.Popen([sys.executable, "-c", _WORKER, str(pid), addr],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
