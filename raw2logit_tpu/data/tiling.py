"""Host-side spatial tiling: full frames -> fixed tiles, and reassembly.

The reference tiles full drone frames once at dataset-build time with
skimage ``view_as_windows`` (utils/dataset_utils.py:71-145, dataset.py:
422-434).  Tiling is the framework's long-context analog (SURVEY.md §5): it
fixes the device-side shapes so every raw->logit graph compiles once.  For
large frames that should NOT be pre-tiled there is also the SP path
(parallel/spatial.py) which shards full-frame rows across the mesh instead.

numpy only — this runs on the host feeding the TPU, never inside a graph.
"""

import os

import numpy as np


def split_img(imgs, ROIs=(3, 3), step=(1, 1)):
    """Split image(s) into (possibly overlapping) ROI windows.

    Shapes accepted (reference utils/dataset_utils.py:71-115):
      (H, W)          -> (N, rh, rw)
      (H, W, C<=3)    -> (N, rh, rw, C)    one image, channels last
      (B, H, W) [C>3] -> (N, rh, rw)       stack of one-channel images
      (B, H, W, C)    -> (N, rh, rw, C)
    """
    imgs = np.asarray(imgs)
    rh, rw = ROIs
    sh, sw = step

    def windows2d(a):
        v = np.lib.stride_tricks.sliding_window_view(a, (rh, rw),
                                                     axis=(0, 1))
        return v[::sh, ::sw]

    if imgs.ndim == 2:
        return windows2d(imgs).reshape(-1, rh, rw)
    if imgs.ndim == 3:
        if imgs.shape[-1] <= 3:  # single HWC image
            v = windows2d(imgs)  # (nh, nw, C, rh, rw) after sliding on 0,1?
            # sliding_window_view keeps the channel axis in place:
            # result is (nh, nw, C, rh, rw) only if axis order shifts; use
            # moveaxis for clarity
            return np.moveaxis(v, 2, -1).reshape(-1, rh, rw, imgs.shape[-1])
        out = [windows2d(im).reshape(-1, rh, rw) for im in imgs]
        return np.concatenate(out, axis=0)
    if imgs.ndim == 4:
        out = [np.moveaxis(windows2d(im), 2, -1).reshape(
            -1, rh, rw, im.shape[-1]) for im in imgs]
        return np.concatenate(out, axis=0)
    raise ValueError(f"unsupported ndim {imgs.ndim}")


def join_blocks(blocks, final_shape):
    """Reassemble non-overlapping blocks (N, C, rh, rw) -> (C, H, W)
    (reference utils/dataset_utils.py:118-145, numpy instead of torch)."""
    blocks = np.asarray(blocks)
    n, c, rh, rw = blocks.shape
    rows = final_shape[0] // rh
    cols = final_shape[1] // rw
    grid = blocks[: rows * cols].reshape(rows, cols, c, rh, rw)
    # (rows, cols, c, rh, rw) -> (c, rows*rh, cols*rw)
    return grid.transpose(2, 0, 3, 1, 4).reshape(c, rows * rh, cols * rw)


def random_ROI(X, Y, ROIs=(512, 512), rng=None):
    """One random crop per (input, target) pair; NHWC in, NHWC out
    (reference utils/dataset_utils.py:148-175, explicit rng)."""
    rng = rng or np.random.default_rng()
    b, h, w, c = X.shape
    X_cut = np.empty((b, ROIs[0], ROIs[1], c), X.dtype)
    Y_cut = np.empty((b, ROIs[0], ROIs[1], Y.shape[-1]), Y.dtype)
    for i in range(b):
        y0 = int(rng.integers(0, max(h - ROIs[0], 0) + 1))
        x0 = int(rng.integers(0, max(w - ROIs[1], 0) + 1))
        X_cut[i] = X[i, y0:y0 + ROIs[0], x0:x0 + ROIs[1]]
        Y_cut[i] = Y[i, y0:y0 + ROIs[0], x0:x0 + ROIs[1]]
    return X_cut, Y_cut


def one2many_random_ROI(X, Y, datasize=1000, ROIs=(512, 512), rng=None):
    """N random crops of the same image (reference :178-198)."""
    rng = rng or np.random.default_rng()
    Xs, Ys = [], []
    for _ in range(datasize):
        xc, yc = random_ROI(X, Y, ROIs, rng)
        Xs.append(xc[0])
        Ys.append(yc[0])
    return np.stack(Xs), np.stack(Ys)


def _save_tile(arr, path):
    from PIL import Image
    arr = np.asarray(arr)
    if arr.dtype.kind == "f":
        arr = (np.clip(arr, 0.0, 1.0) * 65535.0).round().astype(np.uint16)
    Image.fromarray(arr).save(path)


def create_tiles_dataset(dataset, img_dir, mask_dir, tile_size=256):
    """Tile a full-frame segmentation dataset onto disk, keeping only tiles
    whose mask is non-empty (reference dataset.py:422-434: class_detection
    drops car-free tiles). Images -> <img_dir>/<frame>_<tile>.tif (uint16),
    masks -> <mask_dir>/<frame>_<tile>.png (binary)."""
    from PIL import Image
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(mask_dir, exist_ok=True)
    for n in range(len(dataset)):
        img, mask = dataset[n]
        tiles = split_img(np.asarray(img), ROIs=(tile_size, tile_size),
                          step=(tile_size, tile_size))
        mtiles = split_img(np.asarray(mask), ROIs=(tile_size, tile_size),
                           step=(tile_size, tile_size))
        kept = 0
        for t, mt in zip(tiles, mtiles):
            if mt.mean() == 0:
                continue
            tile_id = f"{n:02d}_{kept:05d}"
            _save_tile(t, os.path.join(img_dir, tile_id + ".tif"))
            Image.fromarray(mt > 0).save(
                os.path.join(mask_dir, tile_id + ".png"))
            kept += 1
