"""Real-data disk-format integration: synthetic full frames written to disk
-> tiling build step -> the real dataset classes reading those files -> one
train step. This exercises the otherwise-network-gated code paths
(create_tiles_dataset, create_tiles_dataset_binary,
DroneDatasetSegmentationTiled, DroneDatasetClassificationTiled,
MicroscopyDataset label parsing; reference dataset.py:227-277,280-336,
422-471) entirely offline.
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from raw2logit_tpu.data.datasets import (DroneDatasetClassificationTiled,
                                         DroneDatasetSegmentationTiled,
                                         MicroscopyDataset,
                                         create_tiles_dataset_binary,
                                         get_dataset)
from raw2logit_tpu.data.tiling import create_tiles_dataset

TILE = 64


class _FullFrames:
    """Synthetic full-frame drone stand-in: uint16 raw mosaics + binary
    masks, sized for a 3x2 grid of TILExTILE tiles."""

    task = "segmentation"

    def __init__(self, n=2, h=2 * TILE, w=3 * TILE, seed=0):
        self.items = []
        rng = np.random.default_rng(seed)
        for _ in range(n):
            img = (rng.uniform(0.05, 0.95, size=(h, w)) * 65535).astype(
                np.uint16)
            mask = np.zeros((h, w), np.uint8)
            # one fully-covered tile (clear positive), one ~half-covered,
            # rest empty -> exercises thresholding in both builders
            mask[:TILE, :TILE] = 1
            mask[:TILE // 2, TILE:2 * TILE] = 1
            self.items.append((img, mask))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture()
def drone_root(tmp_path):
    """Build the on-disk drone layout from synthetic full frames."""
    root = str(tmp_path)
    frames = _FullFrames()
    img_dir = os.path.join(root, "drone", f"images_tiles_{TILE}",
                           "raw_scale100")
    mask_dir = os.path.join(root, "drone", f"masks_tiles_{TILE}")
    create_tiles_dataset(frames, img_dir, mask_dir, tile_size=TILE)

    cimg_dir = os.path.join(root, "drone", "classification",
                            f"images_tiles_{TILE}", "raw_scale100_thr_0.01")
    cmask_dir = os.path.join(root, "drone", "classification",
                             f"masks_tiles_{TILE}", "raw_scale100_thr_0.01")
    create_tiles_dataset_binary(frames, cimg_dir, cmask_dir,
                                random_state=72, thr=0.01, tile_size=TILE,
                                data_root=root)
    return root


def test_drone_segmentation_tiled_from_disk(drone_root):
    ds = DroneDatasetSegmentationTiled(I_ratio=1.0, data_root=drone_root,
                                       tile_size=TILE)
    # 2 frames x 2 non-empty-mask tiles kept
    assert len(ds) == 4
    img, mask = ds[0]
    assert img.shape == (TILE, TILE) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert set(np.unique(mask)) <= {0.0, 1.0}
    assert mask.mean() > 0  # empty-mask tiles were dropped


def test_drone_classification_tiled_from_disk(drone_root):
    ds = DroneDatasetClassificationTiled(I_ratio=1.0, data_root=drone_root,
                                         tile_size=TILE)
    assert ds.classes == ["car", "no car"]
    labels = [ds[i][1] for i in range(len(ds))]
    # balanced binary labels: equal car/no-car counts
    assert labels.count(0) == labels.count(1) > 0
    img, _ = ds[0]
    assert img.shape == (TILE, TILE)
    assert 0.0 <= img.min() and img.max() <= 1.0


@pytest.fixture()
def microscopy_root(tmp_path):
    root = str(tmp_path)
    img_dir = os.path.join(root, "microscopy", "images", "raw_scale100")
    label_dir = os.path.join(root, "microscopy", "labels")
    os.makedirs(img_dir)
    os.makedirs(label_dir)
    rng = np.random.default_rng(3)
    lines = []
    # 6 LYT + 5 MON (kept: count>4), 2 BAS (filtered: count<=4), plus the
    # known invalid file (must be excluded even though listed + on disk)
    entries = ([("lyt_%02d" % i, "LYT") for i in range(6)]
               + [("mon_%02d" % i, "MON") for i in range(5)]
               + [("bas_%02d" % i, "BAS") for i in range(2)]
               + [("Ma190c_lame3_zone13_composite_Mcropped_2".replace(
                   ".tiff", ""), "LYT")])
    for name, cls in entries:
        arr = (rng.uniform(0, 1, size=(256, 256)) * 65535).astype(np.uint16)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{name}.tiff"))
        lines.append(f"{name} {cls}")
    with open(os.path.join(label_dir, "Ma190c_annotations.dat"), "wb") as fh:
        fh.write("\n".join(lines).encode())
    return root


def test_microscopy_from_disk(microscopy_root):
    ds = MicroscopyDataset(I_ratio=1.0, data_root=microscopy_root)
    # BAS filtered (count <= 4), invalid file dropped
    assert ds.classes == ["LYT", "MON"]
    assert len(ds) == 11
    img, label = ds[0]
    assert img.shape == (256, 256) and img.dtype == np.float32
    assert label in (0, 1)
    labels = [ds[i][1] for i in range(len(ds))]
    assert labels.count(ds.classes.index("LYT")) == 6
    assert labels.count(ds.classes.index("MON")) == 5


def test_get_dataset_aliases_hit_disk_classes(drone_root):
    ds = get_dataset("DroneSegmentation", data_root=drone_root,
                     tile_size=TILE)
    assert ds.task == "segmentation" and len(ds) == 4


def test_microscopy_rgb_variant_from_disk(microscopy_root):
    """MRGB alias: same labels, images resolved under rgb_scale instead of
    raw_scale (dataset.py:338-354)."""
    import shutil
    from raw2logit_tpu.data.datasets import MicroscopyDatasetRGB
    raw_dir = os.path.join(microscopy_root, "microscopy", "images",
                           "raw_scale100")
    rgb_dir = raw_dir.replace("raw", "rgb")
    os.makedirs(rgb_dir)
    rng = np.random.default_rng(5)
    for name in os.listdir(raw_dir):
        arr = (rng.uniform(0, 1, (256, 256, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(rgb_dir, name))
    ds = MicroscopyDatasetRGB(I_ratio=1.0, data_root=microscopy_root,
                              bits=8)
    assert len(ds) == 11
    img, label = ds[0]
    assert img.shape == (256, 256, 3)
    assert "rgb_scale100" in ds.images[0]


def test_drone_segmentation_full_from_disk(tmp_path):
    """DSF alias reads full frames + masks (dataset.py:205-224)."""
    from raw2logit_tpu.data.datasets import get_dataset
    root = str(tmp_path)
    img_dir = os.path.join(root, "drone", "images_full", "raw_scale100")
    mask_dir = os.path.join(root, "drone", "masks_full")
    os.makedirs(img_dir)
    os.makedirs(mask_dir)
    frames = _FullFrames()
    for i, (img, mask) in enumerate(frames):
        Image.fromarray(img).save(os.path.join(img_dir, f"f{i:02d}.tif"))
        Image.fromarray(mask > 0).save(
            os.path.join(mask_dir, f"f{i:02d}.png"))
    ds = get_dataset("DSF", data_root=root)
    assert len(ds) == 2
    img, mask = ds[0]
    assert img.shape == (2 * TILE, 3 * TILE)
    assert set(np.unique(mask)) <= {0.0, 1.0}


def test_train_step_on_disk_datasets(drone_root):
    """One full jitted train step fed from the files on disk (segmentation
    and binary classification)."""
    from raw2logit_tpu.isp import ParametrizedProcessing
    from raw2logit_tpu.models import UNetPlusPlus, resnet_model
    from raw2logit_tpu.training import (TrainConfig, create_train_state,
                                        make_train_step)

    for name, cls_kwargs in (("seg", {}), ("cls", {})):
        if name == "seg":
            ds = DroneDatasetSegmentationTiled(data_root=drone_root,
                                               tile_size=TILE)
            model = UNetPlusPlus(encoder_name="resnet18", encoder_depth=5,
                                 decoder_channels=(64, 32, 16, 16, 16),
                                 classes=1)
            cfg = TrainConfig(task="segmentation", lr=1e-3,
                              augmentation="weak")
        else:
            ds = DroneDatasetClassificationTiled(data_root=drone_root,
                                                 tile_size=TILE)
            model = resnet_model("resnet18",
                                 fc_out_features=len(ds.classes))
            cfg = TrainConfig(task="classification", lr=1e-3)
        processor = ParametrizedProcessing(
            camera_parameters=ds.camera_parameters, image_size=TILE)
        n = min(4, len(ds))
        raw = jnp.asarray(np.stack([ds[i][0] for i in range(n)]))
        y = np.stack([ds[i][1] for i in range(n)])
        y = jnp.asarray(y, jnp.int32 if name == "cls" else jnp.float32)
        state, tx = create_train_state(cfg, processor, model, raw,
                                       jax.random.key(0))
        step = make_train_step(cfg, processor, model, tx, donate=False)
        _, mets = step(state, raw, y, jax.random.key(1))
        assert np.isfinite(float(mets["loss"]))
