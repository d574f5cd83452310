"""Host-side batch loader with background prefetch + device-mesh sharding.

Replaces the reference's torch DataLoader with 16 worker processes running
the numpy ISP per image (reference train.py:318-320): here the ISP runs
on-device inside the jitted step, so the loader only assembles (raw, label)
batches — from a python dataset or a native mmap TileStore (data/
tilestore.py) — and overlaps the NEXT batch's assembly with the current
step via a single prefetch thread (this host has one core; more threads
would fight the TPU client for it).

With a mesh, batches are placed sharded over the devices (parallel.mesh.
shard_batch) so the jitted step consumes them without a host round-trip.
"""

import threading

import numpy as np


class ArrayDataset:
    """Indexable (img, label) view over a pair of stacked arrays."""

    def __init__(self, X, Y):
        self.X = np.asarray(X)
        self.Y = np.asarray(Y)
        if len(self.X) != len(self.Y):
            raise ValueError(f"X/Y length mismatch: "
                             f"{len(self.X)} != {len(self.Y)}")

    def __len__(self):
        return len(self.X)

    def __getitem__(self, i):
        return self.X[i], self.Y[i]


def make_dataloader(dataset, batch_size, shuffle=True, **kw):
    """Batch loader over an ``(X, Y)`` array pair — the reference's
    ``make_dataloader`` (dataset.py:551-560, TensorDataset + DataLoader).
    Arrays stay in this framework's native layout (NHWC, not the
    reference's np2torch CHW); extra kwargs pass through to Loader
    (seed/mesh/prefetch/drop_last). The ragged tail batch is KEPT by
    default like torch DataLoader's drop_last=False (Loader alone ties
    its default to ``shuffle`` for mesh-divisible training epochs)."""
    X, Y = dataset
    kw.setdefault("drop_last", False)
    return Loader(ArrayDataset(X, Y), batch_size, shuffle=shuffle, **kw)


class Loader:
    """Iterate (images, labels) batches over a dataset or TileStore.

    Args:
        dataset: indexable (img, label) source, or a TileStore (anything
            with a ``gather(indices)`` method).
        batch_size: items per batch.
        shuffle: reshuffle each epoch (deterministic in ``seed`` + epoch).
        drop_last: drop the trailing partial batch. Defaults to ``shuffle``
            (training wants static shapes — a ragged last batch would
            trigger a fresh XLA compile; evaluation keeps every item).
        seed: PRNG seed for shuffling.
        mesh: optional jax mesh; batches are device_put sharded over it.
        prefetch: overlap next-batch assembly with consumption.
    """

    def __init__(self, dataset, batch_size, shuffle=False, drop_last=None,
                 seed=0, mesh=None, prefetch=True):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.mesh = mesh
        self.prefetch = prefetch
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self):
        n = len(self.dataset)
        if not self.shuffle:
            return np.arange(n)
        rng = np.random.default_rng((self.seed, self._epoch))
        return rng.permutation(n)

    def _assemble(self, indices):
        if hasattr(self.dataset, "gather"):
            # native tile store (or a Subset view of one): batched,
            # threaded gather; the store itself serializes gathers
            # against close() (tilestore.py TileStore._lock)
            xs, ys = self.dataset.gather(indices)
        else:
            items = [self.dataset[int(i)] for i in indices]
            xs = np.stack([np.asarray(x, np.float32) for x, _ in items])
            ys = np.asarray([y for _, y in items])
        if self.mesh is not None:
            from raw2logit_tpu.parallel import shard_batch
            xs, ys = shard_batch(self.mesh, (xs, ys))
        return xs, ys

    def _batches(self):
        order = self._order()
        self._epoch += 1
        n = len(order)
        stop = (n - n % self.batch_size) if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            yield order[i:i + self.batch_size]

    def __iter__(self):
        if not self.prefetch:
            for idx in self._batches():
                yield self._assemble(idx)
            return
        yield from self._prefetch()

    def _prefetch(self):
        """One-batch-lookahead pipeline on a background thread; the thread
        is cancellable so an abandoned iterator (break / exception in the
        training loop) doesn't keep decoding forever."""
        import queue

        q = queue.Queue(maxsize=2)
        cancel = threading.Event()
        _END = object()

        def worker():
            try:
                for idx in self._batches():
                    if cancel.is_set():
                        return
                    q.put(self._assemble(idx))
            except BaseException as e:  # surface in the consumer
                q.put(e)
                return
            q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            cancel.set()
            # drain so the worker's blocked put() wakes and sees cancel
            try:
                while not q.empty():
                    q.get_nowait()
            except Exception:
                pass
