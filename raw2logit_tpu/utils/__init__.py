"""Shared utilities."""

import os

import numpy as np


def enable_compilation_cache(path="/tmp/jax_cache"):
    """Persistent XLA compile cache — repeat invocations skip the (remote,
    slow) TPU compile."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", path)
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        # honor a user-exported threshold (setdefault above implies env
        # wins) — only our default of 1 s is forced
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]))
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


def chw_to_hwc(x):
    """Convert reference-layout arrays (B, C, H, W) / (C, H, W) -> NHWC."""
    x = np.asarray(x)
    if x.ndim == 4:
        return np.transpose(x, (0, 2, 3, 1))
    if x.ndim == 3 and x.shape[0] <= 4:
        return np.transpose(x, (1, 2, 0))
    return x


def hwc_to_chw(x):
    x = np.asarray(x)
    if x.ndim == 4:
        return np.transpose(x, (0, 3, 1, 2))
    if x.ndim == 3 and x.shape[-1] <= 4:
        return np.transpose(x, (2, 0, 1))
    return x


def set_random_seed(seed):
    """Host-side seeding (numpy); device randomness uses explicit jax keys
    (utils/base.py:74-82 analog)."""
    np.random.seed(seed)
    import random
    random.seed(seed)


def normalize(img):
    """Per-channel standardization returning (img, mu, sigma)
    (utils/base.py:85-114 semantics, HWC)."""
    img = np.asarray(img, float)
    if img.ndim == 2:
        img = img[:, :, None]
    mu = img.mean(axis=(0, 1))
    sigma = img.std(axis=(0, 1))
    return (img - mu) / (sigma + 1e-4), mu, sigma
