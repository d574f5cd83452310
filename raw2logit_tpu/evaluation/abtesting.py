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

import hashlib
import itertools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from raw2logit_tpu.data import Loader, Subset, get_dataset
from raw2logit_tpu.data.precompute import (PrecomputedRGBView,
                                           precompute_pipeline_rgb)
from raw2logit_tpu.data.datasets import DATASET_STATS
from raw2logit_tpu.evaluation.corruptions import distort
from raw2logit_tpu.evaluation.metrics import ConfusionMetrics, over_n_runs
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
                 severity=1, image_size=256, precompute_rgb=True,
                 **dataset_kwargs):
        self.dataset_name = dataset_name
        self.image_size = image_size
        self.dataset = get_dataset(dataset_name, **dataset_kwargs)
        self.task = self.dataset.task
        self.batch_size = batch_size
        self.severity = severity
        # hoist the loop-invariant static ISP out of the cell programs
        # (see data/precompute.py): every cell of a row/column shares one
        # whole-dataset RGB array, and the jitted cell program shrinks to
        # corruption + normalize + classifier
        self.precompute_rgb = precompute_rgb
        stats = DATASET_STATS.get(
            dataset_name.replace("Synthetic", ""), DATASET_STATS["Microscopy"])
        self.mean = jnp.asarray(stats["mean"], jnp.float32)
        self.std = jnp.asarray(stats["std"], jnp.float32)

    # -- model loading ----------------------------------------------------

    def load_model(self, checkpoint_path, network="resnet18",
                   smp_encoder="resnet34"):
        """Memoized per (path, network): c_make_table evaluates the same
        fold checkpoint for 55 corruption x severity cells — re-running
        the flax init trace + orbax restore each time is pure waste."""
        cache_key = (str(checkpoint_path), network, smp_encoder)
        cache = getattr(self, "_model_cache", None)
        if cache is None:
            cache = self._model_cache = {}
        if cache_key in cache:
            return cache[cache_key]
        result = self._load_model_uncached(checkpoint_path, network,
                                           smp_encoder)
        cache[cache_key] = result
        return result

    def _load_model_uncached(self, checkpoint_path, network,
                             smp_encoder):
        classifier = self._build_classifier(network, smp_encoder)
        sample = jnp.zeros((1, self.image_size, self.image_size, 3),
                           jnp.float32)
        variables = classifier.init(jax.random.key(0), sample, train=False)
        restored = ckpt.restore_like(checkpoint_path, {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {})})
        return classifier, restored

    def _build_classifier(self, network="resnet18", smp_encoder="resnet34"):
        """Architecture only (flax modules are stateless: one instance
        serves every fold's variables)."""
        if self.task == "classification":
            return resnet_model(
                network, fc_out_features=len(self.dataset.classes))
        return UNetPlusPlus(encoder_name=smp_encoder,
                            encoder_depth=5,
                            decoder_channels=(256, 128, 64, 32, 16),
                            classes=1)

    # -- evaluation core ---------------------------------------------------

    def _eval_fn(self, classifier, test_pipeline,
                 corruption="identity", severity=None):
        """Jitted cell program with the checkpoint VARIABLES as an
        argument (not a closure capture): one trace serves every fold of
        a cell, and — cached per test pipeline in ab_make_table — every
        train-model row of a column. The reference re-builds its whole
        eval stack per cell (static_pip_val + model fetch,
        ABtesting.py:175-226); keeping one traced program per distinct
        graph is the XLA-native version of that loop."""
        severity = self.severity if severity is None else severity

        @jax.jit
        def run(clf_variables, raw, key):
            rgb = test_pipeline(raw)
            rgb = distort(key, rgb, corruption, severity)
            rgb = (rgb - self.mean) / self.std
            logits = classifier.apply(clf_variables, rgb, train=False)
            return logits

        return run

    def _run_for(self, network, debayer, sharpening, denoising,
                 corruption="identity", severity=None,
                 smp_encoder="resnet34"):
        """Build (and memoize) the jitted cell program for one
        (architecture, test pipeline, corruption, severity) combination."""
        # resolve before keying: severity=None and severity==self.severity
        # are the same program — two cache entries (or a stale one if
        # self.severity were later mutated) would alias it
        severity = self.severity if severity is None else severity
        cache_key = (network, smp_encoder, debayer, sharpening, denoising,
                     corruption, severity)
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        if cache_key in cache:
            return cache[cache_key]
        classifier = self._build_classifier(network, smp_encoder)
        pipe = StaticPipeline(
            camera_parameters=self.dataset.camera_parameters,
            debayer=debayer, sharpening=sharpening, denoising=denoising)
        run = self._eval_fn(classifier, pipe, corruption, severity)
        # bounded FIFO: the AB matrix reuses 12 column programs; the C
        # battery's 660 (pipeline, corruption, severity) programs are each
        # used for one cell only — holding them all would leak executables
        while len(cache) >= 64:
            cache.pop(next(iter(cache)))
        cache[cache_key] = run
        return run

    def _eval_fn_rgb(self, classifier, corruption="identity",
                     severity=None):
        """Cell program over PRECOMPUTED pipeline RGB: corruption +
        normalize + classifier only. The split at the rgb boundary is
        exact — the in-graph path computes the identical ops in the same
        order (pipeline -> distort -> normalize -> model), it just fuses
        them into one program (equality unit-tested)."""
        severity = self.severity if severity is None else severity

        @jax.jit
        def run(clf_variables, rgb, key):
            rgb = distort(key, rgb, corruption, severity)
            rgb = (rgb - self.mean) / self.std
            return classifier.apply(clf_variables, rgb, train=False)

        return run

    def _run_for_rgb(self, network, corruption="identity", severity=None,
                     smp_encoder="resnet34"):
        """Memoized rgb-input cell program. Shared by EVERY pipeline:
        the C battery runs 55 programs total (corruption x severity)
        instead of 660, the AB matrix exactly one."""
        severity = self.severity if severity is None else severity
        cache_key = (network, smp_encoder, None, None, None,
                     corruption, severity)
        cache = getattr(self, "_run_cache", None)
        if cache is None:
            cache = self._run_cache = {}
        if cache_key in cache:
            return cache[cache_key]
        classifier = self._build_classifier(network, smp_encoder)
        run = self._eval_fn_rgb(classifier, corruption, severity)
        while len(cache) >= 64:
            cache.pop(next(iter(cache)))
        cache[cache_key] = run
        return run

    def _pipeline_rgb(self, db, sh, dn):
        """Whole-dataset ISP output of one static pipeline, computed once
        through a single jitted batched program. Bounded cache of 2 — the
        table loops visit pipelines sequentially (ab_make_table iterates
        column-major so each test pipeline's array is live exactly once)."""
        name = pipeline_name(db, sh, dn)
        cache = getattr(self, "_rgb_cache", None)
        if cache is None:
            cache = self._rgb_cache = {}
        if name in cache:
            return cache[name]
        pipe = StaticPipeline(
            camera_parameters=self.dataset.camera_parameters,
            debayer=db, sharpening=sh, denoising=dn)
        rgb = precompute_pipeline_rgb(self.dataset, pipe, self.batch_size)
        while len(cache) >= 2:
            cache.pop(next(iter(cache)))
        cache[name] = rgb
        return rgb

    def evaluate(self, classifier, clf_variables, valid_indices,
                 debayer, sharpening, denoising, corruption="identity",
                 seed=0, severity=None):
        """One cell of the A/B (or C) matrix -> metrics dict
        (ABclassification / ABsegmentation, ABtesting.py:175-272)."""
        pipe = StaticPipeline(
            camera_parameters=self.dataset.camera_parameters,
            debayer=debayer, sharpening=sharpening, denoising=denoising)
        run = self._eval_fn(classifier, pipe, corruption, severity)
        return self._evaluate_with(run, clf_variables, valid_indices,
                                   seed=seed)

    def _evaluate_with(self, run, clf_variables, valid_indices, seed=0,
                       rgb_all=None):
        base = (PrecomputedRGBView(self.dataset, rgb_all)
                if rgb_all is not None else self.dataset)
        subset = Subset(base, valid_indices)
        loader = Loader(subset, self.batch_size, shuffle=False,
                        drop_last=False)
        key = jax.random.key(seed)

        def padded(raw):
            """Pad the last partial batch to the full batch size: a ragged
            final batch would respecialize the jitted program per distinct
            shape — a fresh (remote, slow) compile per subset size on TPU.
            Returns (padded_raw, n_valid)."""
            n = raw.shape[0]
            if n == self.batch_size:
                return raw, n
            pad = np.repeat(raw[:1], self.batch_size - n, axis=0)
            return np.concatenate([raw, pad], axis=0), n

        if self.task == "classification":
            cm = ConfusionMetrics(len(self.dataset.classes))
            for raw, y in loader:
                key, sub = jax.random.split(key)
                raw_p, n = padded(np.asarray(raw))
                logits = run(clf_variables, jnp.asarray(raw_p), sub)
                cm.update(np.argmax(np.asarray(logits)[:n], axis=-1), y)
            return cm.summary()

        # whole-set IoU: accumulate intersection/union across batches
        # (a plain mean of per-batch IoUs would weight the ragged final
        # batch equally with the full ones)
        inter = union = 0.0
        for raw, y in loader:
            key, sub = jax.random.split(key)
            raw_p, n = padded(np.asarray(raw))
            logits = run(clf_variables, jnp.asarray(raw_p), sub)[:n]
            probs = np.asarray(jax.nn.sigmoid(logits))
            if probs.ndim == 4 and probs.shape[-1] == 1:
                probs = probs[..., 0]
            pred = probs > 0.5
            mask = np.asarray(y) > 0.5
            inter += float(np.logical_and(pred, mask).sum())
            union += float(np.logical_or(pred, mask).sum())
        return {"iou": inter / union if union else 1.0}

    # -- fold aggregation ---------------------------------------------------

    @staticmethod
    def _fold_runs(ckpts, valid_indices, n_runs=None):
        """Normalize (checkpoints, valid_indices) into per-fold pairs.

        ckpts: a single path or a list of per-fold paths (training with
        --n_splits k writes one checkpoint per fold; the reference evaluates
        run_name_0..run_name_{N-1}, ABtesting.py:189-196).
        valid_indices: one shared index list, or one list per fold (the
        reference reads each fold's valid_indices from its state_dict).
        """
        if isinstance(ckpts, (str, os.PathLike)):
            ckpts = [ckpts]
        ckpts = list(ckpts)[: n_runs or None]
        per_fold_idx = (valid_indices
                        if valid_indices and isinstance(valid_indices[0],
                                                        (list, tuple))
                        else [valid_indices] * len(ckpts))
        if len(per_fold_idx) < len(ckpts):
            raise ValueError(f"{len(ckpts)} fold checkpoints but only "
                             f"{len(per_fold_idx)} valid_indices lists")
        return list(zip(ckpts, per_fold_idx))

    def evaluate_runs(self, ckpts, valid_indices, db, sh, dn,
                      corruption="identity", severity=None,
                      network="resnet18", n_runs=None, run_fn=None):
        """One table cell aggregated over fold-runs: mean/sample-std per
        metric (metrics.over_N_runs, ABtesting.py:93-104,213-226).

        The jitted cell program is built once (or passed in via run_fn by
        the table loops, which share it across all rows of a column) and
        reused for every fold — the checkpoint variables are a program
        ARGUMENT, so folds differ only in data. With precompute_rgb the
        pipeline leaves the program too: the cell reads the memoized
        whole-dataset RGB array and the program is corruption +
        normalize + classifier."""
        rgb_all = None
        if self.precompute_rgb:
            rgb_all = self._pipeline_rgb(db, sh, dn)
            if run_fn is None:
                run_fn = self._run_for_rgb(network, corruption=corruption,
                                           severity=severity)
        elif run_fn is None:
            run_fn = self._run_for(network, db, sh, dn,
                                   corruption=corruption, severity=severity)
        summaries = []
        for ckpt_path, idx in self._fold_runs(ckpts, valid_indices, n_runs):
            _, variables = self.load_model(ckpt_path, network)
            summaries.append(self._evaluate_with(run_fn, variables, idx,
                                                 rgb_all=rgb_all))
        return over_n_runs(summaries)

    # -- tables -------------------------------------------------------------

    def ab_make_table(self, checkpoints, valid_indices, out_path,
                      network="resnet18", test_grid=None, n_runs=None):
        """Full pipeline-swap matrix: rows = train pipeline, cols = test
        pipeline (ABMakeTable, ABtesting.py:430-487). Each cell aggregates
        over the per-fold checkpoints with mean/std keys.

        checkpoints: {train_pipeline_name: ckpt_path | [per-fold paths]}
        valid_indices: shared index list or one list per fold.
        test_grid: optional subset of pipeline triples for the columns.
        n_runs: evaluate at most this many folds per cell (--N_runs).

        Iterates COLUMN-major (test pipeline outer): each test pipeline's
        precomputed RGB array is built once and consumed by all 12 rows
        before the next column evicts it.
        """
        meta = self._table_meta(checkpoints, valid_indices, network, n_runs)
        table = self._load_partial(out_path, meta)
        grid = pipeline_grid()
        cols = test_grid if test_grid is not None else grid
        for (db_e, sh_e, dn_e) in cols:
            ename = pipeline_name(db_e, sh_e, dn_e)
            for (db_t, sh_t, dn_t) in grid:
                tname = pipeline_name(db_t, sh_t, dn_t)
                if tname not in checkpoints:
                    continue
                cell = f"{tname}__VS__{ename}"
                if cell in table:
                    continue
                mets = self.evaluate_runs(checkpoints[tname], valid_indices,
                                          db_e, sh_e, dn_e, network=network,
                                          n_runs=n_runs)
                table[cell] = mets
                print(f"{tname} vs {ename}: {mets}", flush=True)
                self._dump_partial(table, out_path)
        self._dump_partial(table, out_path)
        return table

    @staticmethod
    def _table_meta(checkpoints, valid_indices, network, n_runs,
                    **extra):
        """Config fingerprint stored in the table file under '_meta'. A
        resumed run whose config changed (n_runs, checkpoint set, fold
        indices...) must NOT silently keep stale cells — the round-4
        n_runs 2->5 refresh only avoided a mixed-provenance table by
        manually renaming the old files."""
        def _h(obj):
            return hashlib.sha1(
                json.dumps(obj, sort_keys=True, default=str)
                .encode()).hexdigest()[:16]

        return {"n_runs": n_runs, "network": network,
                "checkpoints_hash": _h(checkpoints),
                "valid_indices_hash": _h(valid_indices), **extra}

    @staticmethod
    def _load_partial(out_path, meta=None):
        """Resume support: an interrupted table run (budgeted sweeps run
        under `timeout`) keeps its completed cells; re-running skips them.
        A table whose stored '_meta' fingerprint mismatches the current
        config is DISCARDED (all cells recomputed), never mixed."""
        table = {}
        if out_path and os.path.exists(out_path):
            with open(out_path) as fh:
                try:
                    table = json.load(fh)
                except ValueError:
                    table = {}
        if meta is not None:
            if table and table.get("_meta") != meta:
                print(f"discarding {out_path}: config fingerprint changed "
                      f"({table.get('_meta')} -> {meta})", flush=True)
                table = {}
            table["_meta"] = meta
        return table

    @staticmethod
    def _dump_partial(table, out_path):
        """Write-through after every cell (atomic rename) so a timeout or
        crash never loses completed cells."""
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        tmp = out_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(table, fh, indent=2)
        os.replace(tmp, out_path)

    def c_make_table(self, checkpoints, valid_indices, out_path,
                     network="resnet18", severities=(1, 2, 3, 4, 5),
                     n_runs=None):
        """Pipelines x corruptions x severities (CMakeTable,
        ABtesting.py:625-700), fold-aggregated like ab_make_table."""
        meta = self._table_meta(checkpoints, valid_indices, network, n_runs,
                                severities=list(severities))
        table = self._load_partial(out_path, meta)
        for (db, sh, dn) in pipeline_grid():
            name = pipeline_name(db, sh, dn)
            if name not in checkpoints:
                continue
            for corr in CORRUPTION_LIST:
                for sev in severities:
                    cell = f"{name}__{corr}__s{sev}"
                    if cell in table:
                        continue
                    mets = self.evaluate_runs(
                        checkpoints[name], valid_indices, db, sh, dn,
                        corruption=corr, severity=sev, network=network,
                        n_runs=n_runs)
                    table[cell] = mets
                    print(f"{name} x {corr} s{sev}: {mets}", flush=True)
                    self._dump_partial(table, out_path)
        self._dump_partial(table, out_path)
        return table

    # -- model-involved image panels ----------------------------------------

    def ab_show_images(self, ckpts, valid_indices, train_pip, test_pip,
                       out_dir, network="resnet18", index=0):
        """Per trained model: train-pipeline image, test-pipeline image,
        per-channel |diff| and log|diff| crops, and the model's prediction
        under each pipeline (ABShowImages, ABtesting.py:274-335 — the
        reference also renders the predicted mask for segmentation; here
        classification additionally records the prediction flip)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(out_dir, exist_ok=True)
        (ckpt_path, idx), *_ = self._fold_runs(ckpts, valid_indices)
        classifier, variables = self.load_model(ckpt_path, network)
        raw = jnp.asarray(np.stack([self.dataset[idx[index]][0]]))

        imgs = {}
        preds = {}
        for which, (db, sh, dn) in (("train", train_pip), ("test", test_pip)):
            pipe = StaticPipeline(
                camera_parameters=self.dataset.camera_parameters,
                debayer=db, sharpening=sh, denoising=dn)
            rgb = jax.jit(lambda r: pipe(r))(raw)
            imgs[which] = np.asarray(rgb[0])
            fig = plt.figure()
            plt.imshow(np.clip(imgs[which], 0, 1))
            plt.title(f"{which.capitalize()} Image")
            fig.savefig(os.path.join(out_dir, f"img_{which}.png"))
            plt.close(fig)

            logits = classifier.apply(
                variables, (rgb - self.mean) / self.std, train=False)
            if self.task == "classification":
                preds[which] = int(np.argmax(np.asarray(logits)[0]))
            else:
                mask = np.asarray(jax.nn.sigmoid(logits))[0, ..., 0]
                preds[which] = float(mask.mean())
                fig = plt.figure()
                plt.imshow(mask)
                plt.title(f"Predicted mask ({which} pipeline)")
                fig.savefig(os.path.join(out_dir, f"mask_{which}.png"))
                plt.close(fig)

        diff = np.abs(imgs["train"] - imgs["test"])
        h, w = diff.shape[:2]
        sl = (slice(min(50, h // 4), min(200, h)),
              slice(min(50, w // 4), min(200, w)))
        for c, color in enumerate(["Red", "Green", "Blue"]):
            fig = plt.figure()
            plt.imshow(diff[sl[0], sl[1], c], cmap=f"{color}s")
            plt.title(f"|Train Image - Test Image| - {color}")
            plt.colorbar()
            fig.savefig(os.path.join(out_dir, f"diff_{color}.png"))
            plt.close(fig)
            fig = plt.figure()
            plt.imshow(np.log(np.where(diff[..., c] == 0.0, 1e-5,
                                       diff[..., c])))
            plt.title(f"log(|Train Image - Test Image|) - {color}")
            plt.colorbar()
            fig.savefig(os.path.join(out_dir, f"logdiff_{color}.png"))
            plt.close(fig)

        summary = {"train_pipeline": list(train_pip),
                   "test_pipeline": list(test_pip),
                   "prediction_train": preds["train"],
                   "prediction_test": preds["test"],
                   "prediction_flipped": preds["train"] != preds["test"]
                   if self.task == "classification" else None}
        if self.task == "classification":
            label = int(self.dataset[idx[index]][1])
            summary["label"] = label
        with open(os.path.join(out_dir, "predictions.json"), "w") as fh:
            json.dump(summary, fh, indent=2)
        return summary

    def c_show_images(self, ckpts, valid_indices, test_pip, corruption,
                      severity, out_dir, network="resnet18", index=0):
        """Corrupted test-pipeline image + the model's prediction on it
        (CShowImages, ABtesting.py:371-393, with the model actually run)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(out_dir, exist_ok=True)
        (ckpt_path, idx), *_ = self._fold_runs(ckpts, valid_indices)
        classifier, variables = self.load_model(ckpt_path, network)
        raw = jnp.asarray(np.stack([self.dataset[idx[index]][0]]))
        db, sh, dn = test_pip
        pipe = StaticPipeline(
            camera_parameters=self.dataset.camera_parameters,
            debayer=db, sharpening=sh, denoising=dn)
        rgb = jax.jit(lambda r: pipe(r))(raw)
        rgb = distort(jax.random.key(0), rgb, corruption, severity)
        fig = plt.figure()
        plt.imshow(np.clip(np.asarray(rgb[0]), 0, 1))
        plt.title(f"{corruption} severity {severity}")
        fig.savefig(os.path.join(
            out_dir, f"{pipeline_name(db, sh, dn)}_{corruption}"
            f"_s{severity}.png"))
        plt.close(fig)

        logits = classifier.apply(
            variables, (rgb - self.mean) / self.std, train=False)
        if self.task == "classification":
            pred = int(np.argmax(np.asarray(logits)[0]))
        else:
            mask = np.asarray(jax.nn.sigmoid(logits))[0, ..., 0]
            pred = float(mask.mean())
            fig = plt.figure()
            plt.imshow(mask)
            fig.savefig(os.path.join(out_dir, "mask_corrupted.png"))
            plt.close(fig)
        summary = {"corruption": corruption, "severity": severity,
                   "prediction": pred}
        with open(os.path.join(out_dir, "predictions.json"), "w") as fh:
            json.dump(summary, fh, indent=2)
        return summary


def ab_show_table(table_path, metric="accuracy", out_png=None):
    """Render the NxN matrix as a mean heatmap annotated with the fold
    sigma (ABShowTable, ABtesting.py:489-622 plots mu with a sigma-scaled
    marker per cell)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(table_path) as fh:
        table = json.load(fh)
    # rows and columns are DIFFERENT sets in general: a partial sweep has
    # few trained pipelines but all 12 test columns (ABMakeTable with an
    # incomplete checkpoints dict, or test_grid); '_meta' is the config
    # fingerprint, not a cell
    rows = sorted({k.split("__VS__")[0] for k in table if "__VS__" in k})
    cols = sorted({k.split("__VS__")[1] for k in table if "__VS__" in k})
    mat = np.full((len(rows), len(cols)), np.nan)
    sig = np.full((len(rows), len(cols)), np.nan)
    for k, v in table.items():
        if "__VS__" not in k:
            continue
        a, b = k.split("__VS__")
        mkey = (f"{metric}_mean" if f"{metric}_mean" in v
                else metric if metric in v
                else next((x for x in v if x.endswith("_mean")), list(v)[0]))
        mat[rows.index(a), cols.index(b)] = v[mkey]
        skey = mkey.replace("_mean", "_std")
        if skey != mkey and skey in v:
            sig[rows.index(a), cols.index(b)] = v[skey]
    fig, ax = plt.subplots(figsize=(11, 10))
    im = ax.imshow(mat, cmap="viridis")
    if np.isfinite(sig).any():
        for i in range(len(rows)):
            for j in range(len(cols)):
                if np.isfinite(mat[i, j]):
                    ax.text(j, i, f"{mat[i, j]:.2f}\n±{sig[i, j]:.2f}",
                            ha="center", va="center", fontsize=4,
                            color="white")
    ax.set_xticks(range(len(cols)), cols, rotation=90, fontsize=6)
    ax.set_yticks(range(len(rows)), rows, fontsize=6)
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
    pipelines = sorted({k.split("__")[0] for k in table
                        if "__" in k and not k.startswith("_")})
    corruptions = [c for c in CORRUPTION_LIST
                   if any(f"__{c}__" in k for k in table)]
    mat = np.full((len(pipelines), len(corruptions)), np.nan)
    for i, p in enumerate(pipelines):
        for j, c in enumerate(corruptions):
            vals = [v[f"{metric}_mean"] if f"{metric}_mean" in v
                    else v[metric] if metric in v
                    else v[next((x for x in v if x.endswith("_mean")),
                                list(v)[0])]
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
