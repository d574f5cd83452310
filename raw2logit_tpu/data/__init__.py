"""Data layer: datasets, k-fold, tiling, loader, acquisition, raw decode.

Host-side counterpart of the reference's dataset.py + utils/dataset_utils
+ the DataLoader machinery (SURVEY.md L0/L1): decode + batch on CPU, all
image processing happens on-device inside the jitted graph.
"""

from raw2logit_tpu.data.datasets import (DATASET_STATS, DRONE_CAMERA_PARAMS,
                                         MICROSCOPY_CAMERA_PARAMS,
                                         MultiIntensity, Subset,
                                         SyntheticRawClassification,
                                         SyntheticRawSegmentation,
                                         get_dataset, list_images_in_dir,
                                         load_image)
from raw2logit_tpu.data.kfold import k_fold
from raw2logit_tpu.data.loader import ArrayDataset, Loader, make_dataloader

__all__ = [
    "DATASET_STATS", "DRONE_CAMERA_PARAMS", "MICROSCOPY_CAMERA_PARAMS",
    "MultiIntensity", "Subset", "SyntheticRawClassification",
    "SyntheticRawSegmentation", "get_dataset", "list_images_in_dir",
    "load_image", "k_fold", "ArrayDataset", "Loader", "make_dataloader",
]
