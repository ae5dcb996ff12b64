"""Real multi-process jax.distributed test (VERDICT r1 item 3): two
localhost processes (coordinator + worker, CPU backend, 4 virtual devices
each) bring up an 8-device GLOBAL mesh via
sharding.mesh.initialize_distributed and run both the in-graph sharded
simulation and the host-data decode_sharded over it, asserting
bit-identity with the single-process result inside each worker
(scripts/distributed_worker.py).  This exercises the actual DCN code path
— cross-process device_put, shard_map collectives over a multi-process
mesh, and the output allgather — that the virtual single-process mesh
tests cannot reach.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "distributed_worker.py")


def test_two_process_distributed_decode():
    port = _free_port()
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",      # sitecustomize skips TPU plugin
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
    })
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, WORKER,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=REPO))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=840)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"
        assert "DIST_OK ingraph" in out, f"process {pid}:\n{out[-4000:]}"
        assert "DIST_OK hostdata" in out, f"process {pid}:\n{out[-4000:]}"

    # both processes must have produced the same decode (ben= / sha= lines)
    def marks(out):
        return sorted(ln for ln in out.splitlines()
                      if ln.startswith("DIST_OK"))
    assert marks(outs[0]) == marks(outs[1])
