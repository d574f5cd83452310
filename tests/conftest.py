"""Test config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (mirrors the driver's
multi-chip dry-run environment).
"""

import os

# FORCE cpu: the image sets JAX_PLATFORMS=axon (tunneled TPU); tests must
# never contend for the single real chip. R2L_TEST_TPU=1 opts out for the
# TPU-gated hardware tests (run those alone, with the TPU free).
if os.environ.get("R2L_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# persistent compile cache: repeat suite runs skip XLA recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def raw_batch(rng):
    """Synthetic (4, 64, 64) raw mosaic batch in [0, 1]."""
    return rng.uniform(0.05, 0.95, size=(4, 64, 64)).astype(np.float32)


@pytest.fixture
def raw_image(rng):
    return rng.uniform(0.05, 0.95, size=(64, 64)).astype(np.float32)
