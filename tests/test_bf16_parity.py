"""bf16 task-metric drift bounds (VERDICT r3 weak item 3).

bench.py defaults the classifier compute dtype to bfloat16
(BENCH_DTYPE), while the whole fidelity suite runs float32. These tests
bound what the benchmarked dtype actually changes: identical params +
identical batches through the f32 and bf16 ResNet18, asserting

  * logit drift stays within bf16 roundoff scale (relative to the logit
    spread, not to near-zero individual logits), and
  * the task metric is preserved: argmax agreement >= 99% of samples,
  * one full train step (ISP f32 + classifier bf16, as bench.py runs it)
    yields a loss within tolerance of the all-f32 step.

Deterministic (fixed seeds, CPU backend), so these are regression pins —
if bf16 drift grows past these bounds, the bench dtype loses its
accuracy contract. Params stay float32 in both (flax param_dtype
default); dtype only selects the MXU compute precision, mirroring
models/resnet.py. Reference analog: the SSIM >= 0.999 fidelity contract
the ISP side carries (SURVEY.md §3); the reference itself is f32-only
(model.py has no AMP), so the bf16 path is a TPU-native addition that
must not silently change task outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
from raw2logit_tpu.isp import ParametrizedProcessing
from raw2logit_tpu.models import resnet_model

N_CLASSES = 9
BATCH = 128
SIZE = 64


@pytest.fixture(scope="module")
def batch_and_vars():
    """One ISP-processed batch (the classifier's real input distribution:
    batch-normalized RGB, not raw noise) + shared f32 params."""
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(BATCH, SIZE, SIZE)), jnp.float32)
    proc = ParametrizedProcessing(camera_parameters=MICROSCOPY_CAMERA_PARAMS,
                                  image_size=SIZE)
    pvars = proc.init(jax.random.key(0), raw)
    rgb, _ = proc.apply(pvars, raw, train=False)

    net = resnet_model("resnet18", fc_out_features=N_CLASSES)
    cvars = net.init(jax.random.key(1), rgb, train=False)
    return np.asarray(rgb), cvars


def _logits(dtype, rgb, cvars):
    net = resnet_model("resnet18", fc_out_features=N_CLASSES, dtype=dtype)
    return np.asarray(
        jax.jit(lambda v, x: net.apply(v, x, train=False))(
            cvars, jnp.asarray(rgb)))


def test_bf16_logit_drift_bounded(batch_and_vars):
    rgb, cvars = batch_and_vars
    f32 = _logits(jnp.float32, rgb, cvars)
    bf16 = _logits(jnp.bfloat16, rgb, cvars)
    assert bf16.dtype == np.float32  # fc head computes in f32
    # drift relative to the logit SPREAD (the quantity argmax depends on)
    spread = f32.max(axis=1) - f32.min(axis=1)
    drift = np.abs(bf16 - f32).max(axis=1)
    rel = drift / np.maximum(spread, 1e-6)
    # bf16 has ~8 mantissa bits (~0.4% ulp); measured on this config:
    # median 0.35%, max 0.74% of spread, argmax agreement 100%
    assert float(np.median(rel)) < 0.02, float(np.median(rel))
    assert float(rel.max()) < 0.10, float(rel.max())


def test_bf16_argmax_agreement(batch_and_vars):
    rgb, cvars = batch_and_vars
    f32 = _logits(jnp.float32, rgb, cvars)
    bf16 = _logits(jnp.bfloat16, rgb, cvars)
    agree = float(np.mean(f32.argmax(axis=1) == bf16.argmax(axis=1)))
    assert agree >= 0.99, f"argmax agreement {agree:.3f} < 0.99"


def test_bf16_train_step_loss_parity():
    """The exact configuration bench.py measures: ISP f32 + classifier
    bf16 train step vs all-f32; the loss trajectory must track."""
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)

    rng = np.random.default_rng(2)
    raw = jnp.asarray(rng.uniform(size=(16, SIZE, SIZE)), jnp.float32)
    y = jnp.asarray(rng.integers(0, N_CLASSES, size=(16,)), jnp.int32)
    cfg = TrainConfig(task="classification", lr=1e-3)

    losses = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        proc = ParametrizedProcessing(
            camera_parameters=MICROSCOPY_CAMERA_PARAMS, image_size=SIZE)
        net = resnet_model("resnet18", fc_out_features=N_CLASSES,
                           dtype=dtype)
        state, tx = create_train_state(cfg, proc, net, raw,
                                       jax.random.key(0))
        step = make_train_step(cfg, proc, net, tx)
        traj = []
        for i in range(3):
            state, mets = step(state, raw, y,
                               jax.random.fold_in(jax.random.key(3), i))
            traj.append(float(mets["loss"]))
        losses[name] = traj

    for a, b in zip(losses["f32"], losses["bf16"]):
        assert np.isfinite(b)
        assert abs(a - b) / max(abs(a), 1e-6) < 0.05, (losses)
