"""Conversion/statistics utilities (reference utils/base.py:28-114,
232-240, 291-322 and processing/pipeline_numpy.py:306-329 analogs)."""

import numpy as np
import pandas as pd
import pytest

from raw2logit_tpu.utils import (chw_to_hwc, data_loader_mean_and_std,
                                 get_statistics, get_train_test_indices_drone,
                                 hwc_to_chw, normalize)


def test_chw_hwc_roundtrip():
    x = np.random.default_rng(0).uniform(size=(2, 3, 8, 8)).astype(np.float32)
    assert chw_to_hwc(x).shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(hwc_to_chw(chw_to_hwc(x)), x)


def test_normalize_standardizes():
    img = np.random.default_rng(0).uniform(1, 5, (16, 16, 3))
    out, mu, sigma = normalize(img)
    assert np.allclose(out.mean(axis=(0, 1)), 0, atol=1e-2)
    np.testing.assert_allclose(mu, img.mean(axis=(0, 1)))


def test_data_loader_mean_and_std_batch_averaged():
    """Reference semantics: mean of per-batch stats, torch's ddof=1 std
    (utils/base.py:232-240)."""
    rng = np.random.default_rng(1)
    batches = [(rng.uniform(size=(4, 8, 8, 3)).astype(np.float32), None)
               for _ in range(3)]
    mean, std = data_loader_mean_and_std(batches)
    want_mean = np.mean([b.mean(axis=(0, 1, 2)) for b, _ in batches], axis=0)
    want_std = np.mean([b.std(axis=(0, 1, 2), ddof=1) for b, _ in batches],
                       axis=0)
    np.testing.assert_allclose(mean, want_mean, rtol=1e-6)
    np.testing.assert_allclose(std, want_std, rtol=1e-6)
    assert mean.shape == (3,)


def test_data_loader_mean_and_std_transform_and_grayscale():
    rng = np.random.default_rng(2)
    batches = [(rng.uniform(size=(4, 8, 8)).astype(np.float32), None)]
    mean, std = data_loader_mean_and_std(batches, transform=lambda x: x * 2)
    np.testing.assert_allclose(mean, 2 * batches[0][0].mean(), rtol=1e-6)
    assert mean.shape == (1,)


def test_get_statistics_per_channel_and_scalar():
    """pipeline_numpy.py:306-329: whole-subset single-pass stats; grayscale
    items reduce to scalars, HWC items per channel."""
    rng = np.random.default_rng(3)
    rgb = [(rng.uniform(size=(8, 8, 3)).astype(np.float32), 0)
           for _ in range(5)]
    mean, std = get_statistics(rgb, [0, 2, 4])
    stack = np.stack([rgb[i][0] for i in (0, 2, 4)]).astype(np.float64)
    np.testing.assert_allclose(mean, stack.mean(axis=(0, 1, 2)), rtol=1e-6)
    np.testing.assert_allclose(std, stack.std(axis=(0, 1, 2), ddof=1),
                               rtol=1e-6)

    gray = [(rng.uniform(size=(8, 8)).astype(np.float32), 0)
            for _ in range(4)]
    mean, std = get_statistics(gray, range(4))
    assert np.ndim(mean) == 0 and np.ndim(std) == 0
    np.testing.assert_allclose(
        float(mean), np.stack([g for g, _ in gray]).mean(), rtol=1e-6)


def test_get_train_test_indices_drone_balanced():
    """utils/base.py:291-322: seeded balanced split, label-0 block first,
    complements form the test side."""
    rng = np.random.default_rng(4)
    labels = np.array([0, 1] * 20)
    df = pd.DataFrame({"label": labels,
                       "x": rng.uniform(size=len(labels))})
    train, test = get_train_test_indices_drone(df, frac=0.5, seed=7)
    assert len(train) == 2 * int(len(df) * 0.5 / 2) == 20
    assert set(train).isdisjoint(test)
    assert sorted(train + test) == list(range(len(df)))
    # balanced: half of each side from each class
    assert sum(df.loc[i, "label"] for i in train) == len(train) // 2
    assert sum(df.loc[i, "label"] for i in test) == len(test) // 2
    # deterministic in the seed
    train2, _ = get_train_test_indices_drone(df, frac=0.5, seed=7)
    assert train == train2
    train3, _ = get_train_test_indices_drone(df, frac=0.5, seed=8)
    assert train != train3


def test_get_statistics_with_transform():
    data = [(np.full((4, 4, 3), i, np.float32), 0) for i in range(3)]
    mean, _ = get_statistics(data, [0, 1, 2], transform=lambda x: x + 1)
    np.testing.assert_allclose(mean, [2.0, 2.0, 2.0])


def test_get_name():
    from raw2logit_tpu.utils import get_name

    def my_fn():
        pass

    class Thing:
        pass

    assert get_name(my_fn) == "my_fn"
    assert get_name(Thing) == "Thing"
    assert get_name(Thing()) == "Thing"


def test_read_label_csv():
    """Reference dataset.py:372-381 contract: 'file name'/'label' columns
    -> .tif names + int labels."""
    import pandas as pd
    from raw2logit_tpu.data.datasets import read_label_csv

    df = pd.DataFrame({"file name": ["00_00001", "00_00002"],
                       "label": ["1", 0]})
    images, labels = read_label_csv(df)
    assert images == ["00_00001.tif", "00_00002.tif"]
    assert labels == [1, 0]


def test_make_dataloader_over_array_pair():
    """Reference dataset.py:551-560 surface: (X, Y) arrays -> batch
    iterator; NHWC-native here (no np2torch CHW flip)."""
    from raw2logit_tpu.data import make_dataloader

    X = np.arange(10 * 4 * 4 * 3, dtype=np.float32).reshape(10, 4, 4, 3)
    Y = np.arange(10)
    batches = list(make_dataloader((X, Y), batch_size=4, shuffle=False,
                                   prefetch=False))
    assert len(batches) == 3  # shuffle=False keeps the ragged tail
    xs, ys = batches[0]
    assert xs.shape == (4, 4, 4, 3)
    np.testing.assert_array_equal(ys, Y[:4])
    np.testing.assert_array_equal(batches[2][0], X[8:])

    # shuffled: every item exactly once per epoch INCLUDING the ragged
    # tail (reference torch DataLoader drop_last=False, dataset.py:551-560)
    shuffled = list(make_dataloader((X, Y), batch_size=4, seed=3,
                                    prefetch=False))
    assert [len(b[1]) for b in shuffled] == [4, 4, 2]
    xs_all = np.concatenate([b[0] for b in shuffled])
    np.testing.assert_array_equal(np.sort(xs_all.ravel()), X.ravel())

    with pytest.raises(ValueError, match="mismatch"):
        make_dataloader((X, Y[:5]), batch_size=4)
