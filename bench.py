#!/usr/bin/env python
"""Headline benchmark: raw->logit TRAIN throughput (imgs/sec/chip).

Config: parametrized differentiable ISP -> ResNet18, 256x256 mosaics —
the reference's drift-optimization setup (SURVEY.md §6). vs_baseline is the
ratio against a measured PyTorch-CPU implementation of the same train step
(the reference's only runnable mode in this image; see
benchmarks/torch_baseline.py). Target: >= 10x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

from raw2logit_tpu.utils import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def measure_jax(batch=None, image_size=None, steps=None, n_classes=9,
                warmup=3, dtype=None):
    import os as _os
    batch = batch or int(_os.environ.get("BENCH_BATCH", 64))
    image_size = image_size or int(_os.environ.get("BENCH_SIZE", 256))
    steps = steps or int(_os.environ.get("BENCH_STEPS", 20))
    dtype = dtype or _os.environ.get("BENCH_DTYPE", "bfloat16")
    from raw2logit_tpu.data.datasets import MICROSCOPY_CAMERA_PARAMS
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.models import resnet_model
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)

    processor = ParametrizedProcessing(
        camera_parameters=MICROSCOPY_CAMERA_PARAMS, image_size=image_size)
    classifier = resnet_model(
        "resnet18", fc_out_features=n_classes,
        dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32)
    cfg = TrainConfig(task="classification", lr=1e-5)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.uniform(size=(batch, image_size, image_size)),
                      jnp.float32)
    y = jnp.asarray(rng.integers(0, n_classes, size=(batch,)), jnp.int32)

    state, tx = create_train_state(cfg, processor, classifier, raw,
                                   jax.random.key(0))
    step = make_train_step(cfg, processor, classifier, tx, donate=True)

    key = jax.random.key(1)
    for i in range(warmup):
        state, mets = step(state, raw, y, jax.random.fold_in(key, i))
    jax.block_until_ready(mets["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, mets = step(state, raw, y, jax.random.fold_in(key, 100 + i))
    jax.block_until_ready(mets["loss"])
    dt = time.perf_counter() - t0
    return batch * steps / dt


def main():
    value = measure_jax()

    sys.path.insert(0, "benchmarks")
    from torch_baseline import get_torch_baseline
    try:
        baseline = get_torch_baseline()
    except Exception as e:  # noqa: BLE001 — never fail the bench on baseline
        print(f"baseline measurement failed: {e}", file=sys.stderr)
        baseline = None

    result = {
        "metric": "raw2logit_train_throughput",
        "value": round(value, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
