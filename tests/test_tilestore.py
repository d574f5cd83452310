"""Native tile-store round-trip tests (C++ via ctypes)."""

import numpy as np
import pytest

from raw2logit_tpu.data import SyntheticRawClassification, SyntheticRawSegmentation
from raw2logit_tpu.data.tilestore import TileStore, build_store


def test_classification_roundtrip(tmp_path):
    ds = SyntheticRawClassification(n=6, h=32, w=32, seed=5)
    path = str(tmp_path / "cls.r2l")
    build_store(ds, path)
    store = TileStore(path, task="auto")
    assert len(store) == 6
    assert store.task == "classification"
    imgs, labels = store.gather([0, 3, 5])
    assert imgs.shape == (3, 32, 32)
    assert labels.shape == (3,)
    for j, i in enumerate([0, 3, 5]):
        x, y = ds[i]
        np.testing.assert_allclose(imgs[j], x, atol=1e-6)
        assert labels[j] == y
    store.close()


def test_uint16_normalization(tmp_path):
    class U16DS:
        task = "classification"

        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return (rng.integers(0, 2 ** 16, (16, 16)).astype(np.uint16),
                    i % 2)

    ds = U16DS()
    path = str(tmp_path / "u16.r2l")
    build_store(ds, path, dtype=np.uint16)
    store = TileStore(path, task="auto")
    imgs, labels = store.gather([1])
    want = np.asarray(ds[1][0], np.float32) / 65535.0
    np.testing.assert_allclose(imgs[0], want, atol=1e-7)
    store.close()


def test_segmentation_masks(tmp_path):
    ds = SyntheticRawSegmentation(n=4, h=32, w=32, seed=2)
    path = str(tmp_path / "seg.r2l")
    build_store(ds, path)
    store = TileStore(path, task="auto")
    assert store.task == "segmentation"
    imgs, masks = store.gather([2, 0])
    assert masks.shape == (2, 32, 32)
    np.testing.assert_allclose(masks[0], ds[2][1], atol=1e-6)
    store.close()


def test_store_with_loader(tmp_path):
    from raw2logit_tpu.data import Loader
    ds = SyntheticRawClassification(n=8, h=32, w=32, seed=1)
    path = str(tmp_path / "ld.r2l")
    build_store(ds, path)
    store = TileStore(path, task="auto")
    loader = Loader(store, batch_size=4, shuffle=False)
    xs, ys = next(iter(loader))
    assert xs.shape == (4, 32, 32)
    store.close()


def test_subset_of_store_gathers_mapped_rows(tmp_path):
    """Subset must route gather through its index mapping — plain
    attribute forwarding would hand the store subset-relative positions
    and silently train on the wrong tiles."""
    from raw2logit_tpu.data import Loader, Subset
    ds = SyntheticRawClassification(n=8, h=16, w=16, seed=4)
    path = str(tmp_path / "sub.r2l")
    build_store(ds, path)
    store = TileStore(path, task="auto")
    sub = Subset(store, [5, 2, 7])
    imgs, labels = sub.gather([0, 2])
    np.testing.assert_allclose(imgs[0], ds[5][0], atol=1e-6)
    np.testing.assert_allclose(imgs[1], ds[7][0], atol=1e-6)
    # through the Loader fast path too
    xs, ys = next(iter(Loader(sub, batch_size=3, shuffle=False)))
    np.testing.assert_allclose(xs[1], ds[2][0], atol=1e-6)
    # a Subset of a plain dataset must NOT claim gather
    assert not hasattr(Subset(ds, [0, 1]), "gather")
    store.close()


def test_truncated_store_rejected(tmp_path):
    """A store truncated mid-write must fail at open, not SIGBUS during a
    later gather."""
    ds = SyntheticRawClassification(n=4, h=16, w=16, seed=0)
    path = str(tmp_path / "trunc.r2l")
    build_store(ds, path)
    import os
    size = os.path.getsize(path)
    with open(path, "r+b") as fh:
        fh.truncate(size - 64)
    with pytest.raises(IOError, match="cannot open"):
        TileStore(path, task="auto")
