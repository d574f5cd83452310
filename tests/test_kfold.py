"""k_fold split semantics (reference utils/dataset_utils.py:36-68).

The fold contract is load-bearing: the A/B harness re-derives validation
sets from the valid_indices stored at train time, so k_fold must be
deterministic in its explicit seed (the reference's segmentation branch
used the global numpy RNG, making folds depend on call order — the bug
class this module removes).
"""

import numpy as np
import pytest

from raw2logit_tpu.data.kfold import k_fold


class _FakeDataset:
    def __init__(self, task, n, n_classes=3):
        self.task = task
        self.labels = [i % n_classes for i in range(n)]
        self._n = n

    def __len__(self):
        return self._n


@pytest.mark.parametrize("task", ["classification", "segmentation"])
def test_k_fold_deterministic_across_calls(task):
    ds = _FakeDataset(task, 60)
    a = k_fold(ds, n_splits=3, seed=7, train_size=0.8)
    b = k_fold(ds, n_splits=3, seed=7, train_size=0.8)
    assert a == b  # train-time and eval-time folds must agree exactly


@pytest.mark.parametrize("task", ["classification", "segmentation"])
def test_k_fold_shapes_and_disjointness(task):
    n, train_size = 60, 0.8
    ds = _FakeDataset(task, n)
    folds = k_fold(ds, n_splits=4, seed=0, train_size=train_size)
    assert len(folds) == 4
    for tr, va in folds:
        assert set(tr).isdisjoint(va)
        assert set(tr) | set(va) == set(range(n))
        assert len(tr) == int(n * train_size)
    # different folds draw different permutations
    assert len({tuple(tr) for tr, _ in folds}) == 4


def test_k_fold_seed_changes_folds():
    ds = _FakeDataset("segmentation", 40)
    a = k_fold(ds, n_splits=1, seed=1, train_size=0.5)
    b = k_fold(ds, n_splits=1, seed=2, train_size=0.5)
    assert a != b


def test_k_fold_classification_stratifies():
    # 3 classes, unbalanced multiples: every class must appear in both
    # sides of every fold in proportion (StratifiedShuffleSplit semantics)
    n, n_classes = 90, 3
    ds = _FakeDataset("classification", n, n_classes)
    labels = np.asarray(ds.labels)
    for tr, va in k_fold(ds, n_splits=3, seed=3, train_size=2 / 3):
        for side, frac in ((tr, 2 / 3), (va, 1 / 3)):
            counts = np.bincount(labels[np.asarray(side)],
                                 minlength=n_classes)
            expected = n / n_classes * frac
            assert np.all(np.abs(counts - expected) <= 1), counts
