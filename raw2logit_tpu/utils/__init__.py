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


def get_name(obj):
    """Readable name of a function/class/instance (utils/base.py:186-187)."""
    return obj.__name__ if hasattr(obj, "__name__") else type(obj).__name__


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


def data_loader_mean_and_std(data_loader, transform=None):
    """Per-channel mean/std averaged over loader batches.

    Reference semantics (utils/base.py:232-240): compute each batch's
    per-channel mean and std, then average those across batches (NOT a
    pooled estimate — small trailing batches weigh equally, as there).
    Batches here are NHWC (or NHW grayscale) numpy/jnp arrays; returns
    two (C,) float arrays.
    """
    means, stds = [], []
    for x, _y in data_loader:
        x = np.asarray(x, np.float64)
        if transform is not None:
            x = np.asarray(transform(x), np.float64)
        if x.ndim == 3:  # NHW grayscale -> one channel
            x = x[..., None]
        means.append(x.mean(axis=(0, 1, 2)))
        # torch .std defaults to the unbiased (ddof=1) estimator
        stds.append(x.std(axis=(0, 1, 2), ddof=1))
    return (np.stack(means).mean(axis=0).astype(np.float32),
            np.stack(stds).mean(axis=0).astype(np.float32))


def get_statistics(dataset, train_indices, transform=None):
    """Mean/std of one whole dataset subset in a single pass.

    Reference semantics (processing/pipeline_numpy.py:306-329): gather
    the entire subset as one batch and reduce. Grayscale (H, W) items
    reduce over everything to scalars; (H, W, C) items reduce per
    channel. Returns (mean, std) float32 arrays (shape () or (C,)).
    """
    imgs = []
    for i in train_indices:
        x = np.asarray(dataset[int(i)][0], np.float64)
        if transform is not None:
            x = np.asarray(transform(x), np.float64)
        imgs.append(x)
    batch = np.stack(imgs)
    if batch.ndim == 3:  # (N, H, W) grayscale mosaics -> scalar stats
        return (batch.mean().astype(np.float32),
                batch.std(ddof=1).astype(np.float32))
    return (batch.mean(axis=(0, 1, 2)).astype(np.float32),
            batch.std(axis=(0, 1, 2), ddof=1).astype(np.float32))


def get_train_test_indices_drone(df, frac, seed=None):
    """Balanced binary train/test index split of a labeled DataFrame.

    Reference semantics (utils/base.py:291-322): draw
    ``int(len(df) * frac / 2)`` rows from each label class for the train
    set (seeded sample), the complements form the test set; each side is
    ordered label-0 rows first then label-1 rows. Returns two lists of
    DataFrame index values.
    """
    split_idx = int(len(df) * frac / 2)
    df_with = df[df["label"] == 1]
    df_without = df[df["label"] == 0]

    np.random.seed(seed)
    with_train = df_with.sample(n=split_idx, random_state=seed)
    without_train = df_without.sample(n=split_idx, random_state=seed)
    with_test = df_with.drop(with_train.index)
    without_test = df_without.drop(without_train.index)

    train_indices = list(without_train.index) + list(with_train.index)
    test_indices = list(without_test.index) + list(with_test.index)
    return train_indices, test_indices
