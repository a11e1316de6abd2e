"""Two-process CPU cluster: jax.distributed bring-up + cross-process psum.

Validates the multi-host path end to end on this single machine: worker
processes call `initialize_distributed` against a localhost coordinator,
see the global device count, run a psum over a 2-device mesh spanning both
processes, and shard a work list with `process_slice` — the exact
primitives `run_vspw_sweep` uses for pod-scale ingest
(parallel/mesh.py, pipelines/vspw.py:158-162)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = r"""
import sys
port, pid = sys.argv[1], int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
from vidseg_diffusion_tpu.parallel.mesh import (
    initialize_distributed, process_slice,
)
initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 2, jax.device_count()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.asarray(jax.devices()).reshape(2), axis_names=("data",))
sh = NamedSharding(mesh, P("data"))

x = jax.make_array_from_callback(
    (2, 4), sh, lambda idx: np.full((1, 4), float(jax.process_index() + 1))
)
total = jax.jit(
    lambda a: jnp.sum(a), in_shardings=sh, out_shardings=NamedSharding(mesh, P())
)(x)
assert float(total) == (1.0 + 2.0) * 4, float(total)

sl = process_slice(5)
n = sl.stop - sl.start
assert n in (2, 3), sl
print(f"WORKER_OK {pid} {sl.start} {sl.stop}")
"""


def test_two_process_cpu_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER_OK {pid}" in out, out
    # the two process_slice shards must tile the 5-item list exactly
    spans = sorted(
        tuple(map(int, o.split("WORKER_OK ")[1].split()[1:3])) for o in outs
    )
    assert spans[0][0] == 0 and spans[1][1] == 5 and spans[0][1] == spans[1][0]
