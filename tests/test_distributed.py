"""Multi-host smoke test: two real OS processes initialize
jax.distributed over a local coordinator, form the global data mesh, and
run a jitted cross-process reduction (the gradient-all-reduce pattern of
the DCN scale-out path; parallel/distributed.py)."""

import os
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
from raw2logit_tpu.parallel import distributed

ok = distributed.initialize()
assert ok, "initialize() returned False despite COORDINATOR_ADDRESS"

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2
mesh = distributed.global_mesh()
assert jax.device_count() == 2

# each process contributes its own shard; the jitted sum all-reduces
x_local = np.full((1, 4), jax.process_index() + 1.0, np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), x_local, (2, 4))
total = jax.jit(lambda a: a.sum(),
                out_shardings=NamedSharding(mesh, P()))(arr)
print("DIST_OK", jax.process_index(), float(total),
      distributed.is_primary(), flush=True)
"""


@pytest.mark.slow
def test_two_process_data_parallel_allreduce(tmp_path):
    port = 29500 + os.getpid() % 500
    env_base = {k: v for k, v in os.environ.items()
                if not k.startswith("PALLAS_AXON")
                and k not in ("PYTHONPATH", "XLA_FLAGS")}
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env_base["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env_base["NUM_PROCESSES"] = "2"

    procs = []
    for pid in range(2):
        env = dict(env_base, PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD], env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-2000:]}"
    lines = sorted(line for out, _ in outs for line in out.splitlines()
                   if line.startswith("DIST_OK"))
    # sum over the global array: 1*4 + 2*4 = 12; exactly one primary
    assert lines == ["DIST_OK 0 12.0 True", "DIST_OK 1 12.0 False"], lines
