"""Python binding for the native mmap tile store (native/tilestore.cpp).

The reference re-decodes every image in DataLoader worker processes each
epoch (train.py:318-320); here tiles are decoded ONCE into a packed .r2l
file, then epochs stream batches via mmap + a threaded C++ gather that also
does the uint16/uint8 -> float32 [0,1] normalization (dataset.py:87) at
memory bandwidth. ctypes, not pybind11 (not in image).
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_DTYPE_CODE = {np.dtype(np.float32): 0, np.dtype(np.uint16): 1,
               np.dtype(np.uint8): 2}

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    native = os.path.join(here, "native")
    so = os.path.join(native, "libr2ltilestore.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", native], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(so)
    lib.r2l_open.restype = ctypes.c_void_p
    lib.r2l_open.argtypes = [ctypes.c_char_p]
    lib.r2l_close.argtypes = [ctypes.c_void_p]
    lib.r2l_len.restype = ctypes.c_uint64
    lib.r2l_len.argtypes = [ctypes.c_void_p]
    lib.r2l_shape.argtypes = [ctypes.c_void_p,
                              ctypes.POINTER(ctypes.c_uint64)]
    lib.r2l_label_kind.restype = ctypes.c_uint64
    lib.r2l_label_kind.argtypes = [ctypes.c_void_p]
    lib.r2l_fill_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_void_p, ctypes.c_int]
    lib.r2l_write.restype = ctypes.c_int
    lib.r2l_write.argtypes = [
        ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ctypes.c_void_p]
    _lib = lib
    return lib


_HEADER_FIELDS = 7  # magic, n, h, w, c, dtype, label_kind (u64 each)
_MAGIC = 0x52324C54494C4531


def build_store(dataset, path, dtype=np.float32):
    """Materialize an indexable (img, label) dataset into a .r2l store.

    Streams item-by-item through a numpy memmap of the (fixed-layout)
    file, so building from large full-frame datasets never holds more
    than one decoded item in RAM (the batch-sized C path, r2l_write,
    remains for in-memory buffers)."""
    n = len(dataset)
    if n == 0:
        raise ValueError("empty dataset")
    x0, y0 = dataset[0]
    x0 = np.asarray(x0)
    h, w = x0.shape[:2]
    c = x0.shape[2] if x0.ndim == 3 else 0
    dtype = np.dtype(dtype)
    code = _DTYPE_CODE[dtype]

    task = getattr(dataset, "task", None)
    if task is None or task == "auto":
        task = ("segmentation" if np.asarray(y0).ndim >= 2
                else "classification")
    label_kind = 0 if task == "classification" else 1

    header = np.array([_MAGIC, n, h, w, c, code, label_kind], np.uint64)
    data_off = _HEADER_FIELDS * 8
    item_elems = (n,) + x0.shape
    labels_off = data_off + int(np.prod(item_elems)) * dtype.itemsize
    if label_kind == 0:
        label_shape, label_dtype = (n,), np.int64
    else:
        label_shape, label_dtype = (n, h, w), np.float32
    total = labels_off + int(np.prod(label_shape)) * \
        np.dtype(label_dtype).itemsize

    with open(path, "wb") as fh:
        fh.truncate(total)
    hdr = np.memmap(path, np.uint64, "r+", 0, (_HEADER_FIELDS,))
    hdr[:] = header
    hdr.flush()
    imgs = np.memmap(path, dtype, "r+", data_off, item_elems)
    labels = np.memmap(path, label_dtype, "r+", labels_off, label_shape)
    for i in range(n):
        x, y = dataset[i]
        imgs[i] = np.asarray(x, dtype)
        labels[i] = np.asarray(y)
    imgs.flush()
    labels.flush()
    return path


class TileStore:
    """mmap-backed random-access tile source with a threaded gather.

    Duck-types the dataset protocol (len/getitem) and adds ``gather`` for
    batched access (used by data.loader.Loader).
    """

    def __init__(self, path, task="auto", n_threads=None):
        self._lib = _load_lib()
        # serializes gathers against close(): a munmap while a prefetch
        # thread is mid-gather is a use-after-unmap segfault
        self._lock = threading.Lock()
        self._h = self._lib.r2l_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open tile store {path}")
        shape = (ctypes.c_uint64 * 4)()
        self._lib.r2l_shape(self._h, shape)
        self.h, self.w, self.c, self._dtype_code = (int(shape[0]),
                                                    int(shape[1]),
                                                    int(shape[2]),
                                                    int(shape[3]))
        self._n = int(self._lib.r2l_len(self._h))
        kind = int(self._lib.r2l_label_kind(self._h))
        self.task = "classification" if kind == 0 else "segmentation"
        if task != "auto" and task != self.task:
            raise ValueError(f"store is {self.task}, requested {task}")
        self._label_kind = kind
        self.n_threads = n_threads if n_threads is not None else \
            min(4, os.cpu_count() or 1)

    def __len__(self):
        return self._n

    def gather(self, indices):
        """indices -> (images float32 (B,H,W[,C]), labels int64 (B,) or
        masks float32 (B,H,W))."""
        idx = np.ascontiguousarray(indices, np.int64)
        b = idx.shape[0]
        img_shape = ((b, self.h, self.w) if self.c == 0
                     else (b, self.h, self.w, self.c))
        imgs = np.empty(img_shape, np.float32)
        if self._label_kind == 0:
            labels = np.empty((b,), np.int64)
        else:
            labels = np.empty((b, self.h, self.w), np.float32)
        with self._lock:
            if self._h is None:
                raise ValueError("store is closed")
            self._lib.r2l_fill_batch(
                self._h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                b, imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                labels.ctypes.data_as(ctypes.c_void_p), self.n_threads)
        return imgs, labels

    def __getitem__(self, idx):
        imgs, labels = self.gather([idx])
        return imgs[0], (int(labels[0]) if self._label_kind == 0
                         else labels[0])

    def close(self):
        with self._lock:
            if self._h is not None:
                self._lib.r2l_close(self._h)
                self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
