"""Cross-validation splits (reference utils/dataset_utils.py:36-68).

Classification: stratified shuffle split (sklearn, as the reference);
segmentation: seeded random permutation split — the reference used the
GLOBAL numpy RNG for this (np.random.permutation), making folds depend on
call order; here the seed is explicit so train-time and eval-time folds
always agree.
"""

import numpy as np


def k_fold(dataset, n_splits, seed, train_size):
    """-> list of (train_indices, valid_indices), n_splits pairs."""
    if dataset.task == "classification":
        from sklearn.model_selection import StratifiedShuffleSplit
        labels = list(dataset.labels)
        sss = StratifiedShuffleSplit(n_splits=n_splits,
                                     train_size=train_size,
                                     random_state=seed)
        return [(tr.tolist(), va.tolist())
                for tr, va in sss.split(np.zeros(len(labels)), labels)]

    rng = np.random.default_rng(seed)
    idxs = []
    split = int(len(dataset) * train_size)
    for _ in range(n_splits):
        perm = rng.permutation(len(dataset))
        idxs.append((perm[:split].tolist(), perm[split:].tolist()))
    return idxs
