"""Drift-synthesis evaluation harness: A/B pipeline-swap matrix and
Hendrycks-C corruption tables (figures/ABtesting.py re-designed TPU-first).

A/B test: a model trained on static pipeline X is evaluated on data
processed by static pipeline Y, for the full 12x12 cross product of
(debayer in {bilinear, malvar2004, menon2007}) x (sharpening in
{sharpening_filter, unsharp_masking}) x (denoising in {gaussian_denoising,
median_denoising}) — the reference's grid (ABtesting.py:430-487 uses
12 = 3x2x2 pipelines). C test: model trained on X, evaluated on X + one of
11 corruptions at severity 1..5 (ABtesting.py:625-797).

TPU-native: the test-pipeline ISP + corruption + normalization + classifier
run as ONE jitted batched graph per configuration; the reference loops
per-image on CPU through DataLoader workers (ABtesting.py:200-211).
"""

import itertools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.data import Loader, Subset, get_dataset
from raw2logit_tpu.data.datasets import DATASET_STATS
from raw2logit_tpu.evaluation.corruptions import distort
from raw2logit_tpu.evaluation.metrics import ConfusionMetrics
from raw2logit_tpu.isp import StaticPipeline
from raw2logit_tpu.losses import iou_score
from raw2logit_tpu.models import UNetPlusPlus, resnet_model
from raw2logit_tpu.training import checkpoint as ckpt

DEBAYERS = ["bilinear", "malvar2004", "menon2007"]
SHARPENINGS = ["sharpening_filter", "unsharp_masking"]
DENOISINGS = ["gaussian_denoising", "median_denoising"]

CORRUPTION_LIST = ["identity", "gaussian_noise", "shot_noise",
                   "impulse_noise", "speckle_noise", "gaussian_blur",
                   "zoom_blur", "contrast", "brightness", "saturate",
                   "elastic_transform"]


def pipeline_grid():
    """The 12 static pipelines of the sweep."""
    return list(itertools.product(DEBAYERS, SHARPENINGS, DENOISINGS))


def pipeline_name(db, sh, dn):
    return f"{db}_{sh}_{dn}"


class ABTesting:
    """Evaluate trained checkpoints across processing pipelines.

    Args:
        dataset_name: 'Microscopy' | 'DroneSegmentation' | synthetic names.
        runs_root: directory of local runs (results/runs/<experiment>).
        n_classes: task classes (read from dataset if None).
    """

    def __init__(self, dataset_name, batch_size=32, data_root="data",
                 severity=1, image_size=256, **dataset_kwargs):
        self.dataset_name = dataset_name
        self.image_size = image_size
        self.dataset = get_dataset(dataset_name, **dataset_kwargs)
        self.task = self.dataset.task
        self.batch_size = batch_size
        self.severity = severity
        stats = DATASET_STATS.get(
            dataset_name.replace("Synthetic", ""), DATASET_STATS["Microscopy"])
        self.mean = jnp.asarray(stats["mean"], jnp.float32)
        self.std = jnp.asarray(stats["std"], jnp.float32)

    # -- model loading ----------------------------------------------------

    def load_model(self, checkpoint_path, network="resnet18",
                   smp_encoder="resnet34"):
        if self.task == "classification":
            classifier = resnet_model(
                network, fc_out_features=len(self.dataset.classes))
        else:
            classifier = UNetPlusPlus(encoder_name=smp_encoder,
                                      encoder_depth=5,
                                      decoder_channels=(256, 128, 64, 32, 16),
                                      classes=1)
        sample = jnp.zeros((1, self.image_size, self.image_size, 3),
                           jnp.float32)
        variables = classifier.init(jax.random.key(0), sample, train=False)
        restored = ckpt.restore_like(checkpoint_path, {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})})
        return classifier, restored

    # -- evaluation core ---------------------------------------------------

    def _eval_fn(self, classifier, clf_variables, test_pipeline,
                 corruption="identity"):
        severity = self.severity

        @jax.jit
        def run(raw, key):
            rgb = test_pipeline(raw)
            rgb = distort(key, rgb, corruption, severity)
            rgb = (rgb - self.mean) / self.std
            logits = classifier.apply(clf_variables, rgb, train=False)
            return logits

        return run

    def evaluate(self, classifier, clf_variables, valid_indices,
                 debayer, sharpening, denoising, corruption="identity",
                 seed=0):
        """One cell of the A/B (or C) matrix -> metrics dict
        (ABclassification / ABsegmentation, ABtesting.py:175-272)."""
        pipe = StaticPipeline(
            camera_parameters=self.dataset.camera_parameters,
            debayer=debayer, sharpening=sharpening, denoising=denoising)
        run = self._eval_fn(classifier, clf_variables, pipe, corruption)
        subset = Subset(self.dataset, valid_indices)
        loader = Loader(subset, self.batch_size, shuffle=False,
                        drop_last=False)
        key = jax.random.key(seed)

        if self.task == "classification":
            cm = ConfusionMetrics(len(self.dataset.classes))
            for raw, y in loader:
                key, sub = jax.random.split(key)
                logits = run(jnp.asarray(raw), sub)
                cm.update(np.argmax(np.asarray(logits), axis=-1), y)
            return cm.summary()

        ious = []
        for raw, y in loader:
            key, sub = jax.random.split(key)
            logits = run(jnp.asarray(raw), sub)
            probs = jax.nn.sigmoid(logits)
            ious.append(float(iou_score(probs, jnp.asarray(y))))
        return {"iou": float(np.mean(ious))}

    # -- tables -------------------------------------------------------------

    def ab_make_table(self, checkpoints, valid_indices, out_path,
                      network="resnet18", test_grid=None):
        """Full pipeline-swap matrix: rows = train pipeline (one checkpoint
        each), cols = test pipeline (ABMakeTable, ABtesting.py:430-487).

        checkpoints: {train_pipeline_name: checkpoint_path}
        test_grid: optional subset of pipeline triples for the columns.
        """
        table = {}
        grid = pipeline_grid()
        cols = test_grid if test_grid is not None else grid
        for (db_t, sh_t, dn_t) in grid:
            tname = pipeline_name(db_t, sh_t, dn_t)
            if tname not in checkpoints:
                continue
            classifier, variables = self.load_model(checkpoints[tname],
                                                    network)
            for (db_e, sh_e, dn_e) in cols:
                ename = pipeline_name(db_e, sh_e, dn_e)
                mets = self.evaluate(classifier, variables, valid_indices,
                                     db_e, sh_e, dn_e)
                table[f"{tname}__VS__{ename}"] = mets
                print(f"{tname} vs {ename}: {mets}")
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(table, fh, indent=2)
        return table

    def c_make_table(self, checkpoints, valid_indices, out_path,
                     network="resnet18", severities=(1, 2, 3, 4, 5)):
        """Pipelines x corruptions x severities (CMakeTable,
        ABtesting.py:625-700)."""
        table = {}
        for (db, sh, dn) in pipeline_grid():
            name = pipeline_name(db, sh, dn)
            if name not in checkpoints:
                continue
            classifier, variables = self.load_model(checkpoints[name],
                                                    network)
            for corr in CORRUPTION_LIST:
                for sev in severities:
                    self.severity = sev
                    mets = self.evaluate(classifier, variables,
                                         valid_indices, db, sh, dn,
                                         corruption=corr)
                    table[f"{name}__{corr}__s{sev}"] = mets
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(table, fh, indent=2)
        return table


def ab_show_table(table_path, metric="accuracy_mean", out_png=None):
    """Render the NxN matrix as a heatmap (ABShowTable,
    ABtesting.py:489-622)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(table_path) as fh:
        table = json.load(fh)
    names = sorted({k.split("__VS__")[0] for k in table})
    n = len(names)
    mat = np.full((n, n), np.nan)
    for k, v in table.items():
        a, b = k.split("__VS__")
        metric_key = metric if metric in v else list(v)[0]
        mat[names.index(a), names.index(b)] = v[metric_key]
    fig, ax = plt.subplots(figsize=(10, 9))
    im = ax.imshow(mat, cmap="viridis")
    ax.set_xticks(range(n), names, rotation=90, fontsize=6)
    ax.set_yticks(range(n), names, fontsize=6)
    ax.set_xlabel("test pipeline")
    ax.set_ylabel("train pipeline")
    fig.colorbar(im)
    fig.tight_layout()
    out_png = out_png or table_path.replace(".json", ".png")
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return out_png


def c_show_table(table_path, metric="accuracy", out_png=None):
    """Render the corruption table: rows = pipelines, cols = corruptions,
    one line per severity -> mean-over-severity heatmap + per-severity JSON
    (CShowTable, ABtesting.py:703-797)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(table_path) as fh:
        table = json.load(fh)
    pipelines = sorted({k.split("__")[0] for k in table})
    corruptions = [c for c in CORRUPTION_LIST
                   if any(f"__{c}__" in k for k in table)]
    mat = np.full((len(pipelines), len(corruptions)), np.nan)
    for i, p in enumerate(pipelines):
        for j, c in enumerate(corruptions):
            vals = [v[metric] if metric in v else list(v.values())[0]
                    for k, v in table.items()
                    if k.startswith(f"{p}__{c}__")]
            if vals:
                mat[i, j] = float(np.mean(vals))
    fig, ax = plt.subplots(figsize=(12, 8))
    im = ax.imshow(mat, cmap="viridis")
    ax.set_xticks(range(len(corruptions)), corruptions, rotation=90,
                  fontsize=7)
    ax.set_yticks(range(len(pipelines)), pipelines, fontsize=7)
    ax.set_xlabel("corruption (mean over severities)")
    ax.set_ylabel("train pipeline")
    fig.colorbar(im)
    fig.tight_layout()
    out_png = out_png or table_path.replace(".json", ".png")
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return out_png
